"""The WAV codec path decodes REAL bytes: container round-trip across the
full byte range, malformed-container rejection, and the Spark pipeline
producing codec-derived features end to end."""

from __future__ import annotations

import pytest

from metas_judiciarias_etl_spark.operators.multimodal import (
    decode_wav_pcm8,
    encode_wav_pcm8,
    mm_decode_features,
)


def test_wav_roundtrip_full_byte_range():
    payload = bytes(range(256)) * 3 + b"\x00\xff"
    wav = encode_wav_pcm8(payload)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    pcm, rate, ch = decode_wav_pcm8(wav)
    assert pcm == payload and rate == 8000 and ch == 1


def test_wav_empty_payload():
    pcm, _, _ = decode_wav_pcm8(encode_wav_pcm8(b""))
    assert pcm == b""


def test_malformed_container_rejected():
    import wave

    with pytest.raises(wave.Error):
        decode_wav_pcm8(b"not a riff container at all")


def test_wrong_sample_width_rejected():
    import io
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)  # 16-bit, not the expected 8-bit
        w.setframerate(8000)
        w.writeframes(b"\x00\x01\x02\x03")
    with pytest.raises(ValueError, match="8-bit"):
        decode_wav_pcm8(buf.getvalue())


def test_decode_features_end_to_end(spark, sf_oracle):
    rows = mm_decode_features(spark, sf_oracle).limit(5).collect()
    assert rows
    for r in rows:
        assert r["decoder"] == "wav-pcm8"
        assert r["n_bytes"] > 0 and 0 <= r["max_byte"] <= 255


def test_ppm_roundtrip_full_byte_range():
    from metas_judiciarias_etl_spark.operators.multimodal import (
        IMG_W,
        decode_ppm,
        encode_ppm,
    )

    payload = bytes(range(256))
    img = decode_ppm(encode_ppm(payload))
    h, w, ch = img.shape
    assert (w, ch) == (IMG_W, 3)
    assert h == -(-len(payload) // (IMG_W * 3))
    flat = img.tobytes()
    assert flat[: len(payload)] == payload  # lossless through the container
    assert set(flat[len(payload):]) <= {0}  # zero padding only


def test_ppm_malformed_rejected():
    from metas_judiciarias_etl_spark.operators.multimodal import decode_ppm

    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 2\n255\n" + b"\x00" * 12)  # wrong magic
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)  # unsupported maxval


def test_nn_resize_index_math():
    import numpy as np

    from metas_judiciarias_etl_spark.operators.multimodal import resize_nn

    # 4x4 image whose pixel value encodes its (row, col): NN floor
    # sampling to 2x2 must pick rows/cols {0, 2}
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    small = resize_nn(img, 2, 2)
    assert small.shape == (2, 2, 3)
    assert (small == img[[0, 2]][:, [0, 2], :]).all()


def test_image_histogram_matches_direct_decode(spark, sf_small):
    """Histogram bins must equal a direct numpy decode of the same PPM
    chain, bins must sum to the pixel grid, and padding must land in
    bin 0."""
    import numpy as np

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
    )

    registry.load_all()
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_small}/documents.parquet").to_pandas()
    got = {
        r["doc_id"]: r
        for r in registry.QUERIES["mm_image_histogram"](
            spark, sf_small
        ).collect()
    }
    for r in docs.itertuples():
        payload = r.text.encode("utf-8")
        img = decode_ppm(encode_ppm(payload))
        counts = np.bincount(img.reshape(-1) >> 6, minlength=4)
        row = got[r.doc_id]
        assert [row[f"bin_{i}"] for i in range(4)] == list(counts)
        assert sum(counts) == img.size == row["src_h"] * 48
        assert row["n_pad"] == img.size - len(payload)
