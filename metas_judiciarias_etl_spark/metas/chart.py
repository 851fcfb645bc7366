"""Driver-edge chart render (reference ``Versao_Np.py:83-98``,
``gerar_grafico``): a horizontal-bar PNG of per-court values for one meta.

Presentation layer, deliberately OUTSIDE the relational engine: the data
relation is ``metas_chart_ranking`` (oracle-checked); this module only
rasterizes its few dozen rows on the driver. Uses matplotlib when
installed; otherwise a dependency-free rasterizer (numpy + the stdlib zlib
PNG encoder) so the surface is complete in codec-less environments too.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from pyspark.sql import DataFrame

# (bar, background, axis) RGB
_BAR = (31, 119, 180)
_BG = (255, 255, 255)
_AXIS = (80, 80, 80)


def _write_png(rgb: np.ndarray, path: str) -> None:
    """Encode an HxWx3 uint8 array as a PNG using only the stdlib."""
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as fh:
        fh.write(png)


def _render_fallback(rows: list[tuple[str, float]], path: str) -> None:
    """Label-free horizontal bar raster (text needs fonts; the matplotlib
    path has labels, this one has geometry)."""
    bar_h, gap, left, right, top = 22, 8, 40, 20, 20
    width = 800
    height = top * 2 + len(rows) * (bar_h + gap)
    img = np.full((height, width, 3), _BG, dtype=np.uint8)
    vmax = max((abs(v) for _, v in rows), default=1.0) or 1.0
    span = width - left - right
    img[:, left - 2 : left, :] = _AXIS  # y axis
    for i, (_sigla, value) in enumerate(rows):
        y0 = top + i * (bar_h + gap)
        w = max(1, int(round(abs(value) / vmax * span)))
        img[y0 : y0 + bar_h, left : left + w, :] = _BAR
    _write_png(img, path)


def render_chart(ranking: DataFrame, path: str, meta_name: str = "meta1") -> str:
    """Render the ``metas_chart_ranking`` relation for one meta to a PNG.

    Collects the ranking rows (one per court — a driver-sized relation by
    construction) ordered by ``bar_pos``. Returns ``path``.
    """
    rows = [
        (r["sigla_tribunal"], float(r["value"]))
        for r in ranking.filter(ranking["meta_name"] == meta_name)
        .orderBy("bar_pos")
        .collect()
    ]
    try:
        import matplotlib  # type: ignore[import-not-found]

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt  # type: ignore[import-not-found]

        fig, ax = plt.subplots(figsize=(8, max(2, 0.3 * len(rows))))
        ax.barh(
            [s for s, _ in reversed(rows)],
            [v for _, v in reversed(rows)],
            color="#1f77b4",
        )
        ax.set_title(meta_name)
        fig.tight_layout()
        fig.savefig(path)
        plt.close(fig)
    except ImportError:
        _render_fallback(rows, path)
    return path
