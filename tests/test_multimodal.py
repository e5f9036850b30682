"""Multimodal plumbing tests: schema, batch shapes, determinism under
repartitioning, decode/resize/frame-sample semantics on the OJSM
synthetic format, and NotImplementedError gating for real formats."""

from __future__ import annotations

import numpy as np
import pytest

from opensearch_jvector_spark.operators.multimodal import (
    HEADER_LEN,
    media_embedding,
    media_features,
    media_metadata,
    resize_images,
    sample_frames,
    synth_payload,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, 30).cache()


def test_metadata_schema_and_values(media):
    meta = media_metadata(media)
    assert meta.columns == [
        "media_id", "modality", "width", "height", "channels",
        "n_frames", "payload_bytes",
    ]
    rows = {r.media_id: r for r in meta.collect()}
    assert len(rows) == 30
    for mid, r in rows.items():
        assert r.modality == {0: "image", 1: "audio", 2: "video"}[mid % 3]
        assert r.payload_bytes == r.width * r.height * r.channels * r.n_frames
        if r.modality == "image":
            assert r.n_frames == 1 and r.channels == 3


def test_features_match_numpy_reference(media):
    feats = {r.media_id: r for r in media_features(media).collect()}
    # independent reference for media 4 (audio: c=1)
    raw = synth_payload(4, 4 % 3, 8 + (4 * 7) % 24, 8 + (4 * 5) % 16,
                        3 if 4 % 3 != 1 else 1, 1 if 4 % 3 == 0 else 2 + 4 % 4)
    arr = np.frombuffer(raw, dtype=np.uint8, offset=HEADER_LEN)
    assert feats[4].mean_val == pytest.approx(float(arr.mean()))
    assert sum(feats[4].histogram) == len(arr)


def test_determinism_under_repartition(spark, media):
    a = sorted(
        (r.media_id, r.mean_val) for r in media_features(media).collect()
    )
    b = sorted(
        (r.media_id, r.mean_val)
        for r in media_features(media.repartition(7)).collect()
    )
    assert a == b


def test_resize_shapes(media):
    resized = resize_images(media, 4, 4)
    meta = {r.media_id: r for r in media_metadata(resized).collect()}
    for mid, r in meta.items():
        if mid % 3 == 0:  # image
            assert (r.width, r.height) == (4, 4)
            assert r.payload_bytes == 4 * 4 * r.channels
        else:  # pass-through
            assert (r.width, r.height) != (4, 4) or r.n_frames > 1


def test_frame_sampling(media):
    frames = sample_frames(media, every=2).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    # only videos (media_id % 3 == 2) produce frames
    assert set(by_media) == {m for m in range(30) if m % 3 == 2}
    for mid, idxs in by_media.items():
        n_frames = 2 + mid % 4
        assert sorted(idxs) == list(range(0, n_frames, 2))
    # each frame decodes as a single-frame image
    fdf = sample_frames(media, every=2).withColumnRenamed(
        "frame_payload", "payload"
    )
    fmeta = media_metadata(fdf.select("media_id", "payload"))
    assert fmeta.filter("n_frames <> 1 OR modality <> 'image'").count() == 0


def test_embedding_feeds_similarity(spark, media):
    from opensearch_jvector_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    emb = media_embedding(media, dim=8).withColumnRenamed("media_id", "vec_id")
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    top = cosine_topk_bruteforce(emb, q, 5)
    rows = top.collect()
    assert rows[0].vec_id == 0 and rows[0].cos == pytest.approx(1.0)
    assert len(rows) == 5


def test_real_format_decode_is_gated(spark):
    import pandas as pd

    bad = spark.createDataFrame(
        pd.DataFrame({"media_id": [0], "payload": [b"\x89PNG\r\n" + b"x" * 64]})
    )
    with pytest.raises(Exception) as ei:
        media_features(bad).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_jpeg_decode_roundtrip_when_pillow_present(spark):
    """Real-format decode path (reference capability: actual media, not
    just the synthetic container). Runs only when Pillow is importable;
    in the hermetic container it is skipped and the gate above applies."""
    from opensearch_jvector_spark.operators.multimodal import HAVE_PIL

    if not HAVE_PIL:
        pytest.skip("Pillow not installed — JPEG branch gated off")
    import io

    import numpy as np
    import pandas as pd
    import PIL.Image as Image

    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, size=(16, 24, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    blob = buf.getvalue()
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [0], "payload": [blob]})
    )
    row = media_features(df).collect()[0]
    ref = np.asarray(Image.open(io.BytesIO(blob))).astype(np.float64)
    assert row.modality == "image"
    assert row.mean_val == pytest.approx(ref.mean(), abs=1e-9)


def test_wav_decode_roundtrip(spark):
    """Real audio decode (stdlib wave — always available): 16-bit and
    8-bit PCM WAV blobs round-trip through media_features with the
    documented uint8 companding."""
    import io
    import wave as wavemod

    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    s16 = rng.randint(-32768, 32767, size=200, dtype=np.int16)
    buf16 = io.BytesIO()
    with wavemod.open(buf16, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(s16.tobytes())
    s8 = rng.randint(0, 256, size=150, dtype=np.uint8)
    buf8 = io.BytesIO()
    with wavemod.open(buf8, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes(s8.tobytes())

    df = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [0, 1], "payload": [buf16.getvalue(), buf8.getvalue()]}
        )
    )
    rows = {r.media_id: r for r in media_features(df).collect()}
    exp16 = ((s16.astype(np.int32) >> 8) + 128).astype(np.uint8)
    assert rows[0].modality == "audio"
    assert rows[0].mean_val == pytest.approx(exp16.astype(float).mean(), abs=1e-9)
    assert rows[1].modality == "audio"
    assert rows[1].mean_val == pytest.approx(s8.astype(float).mean(), abs=1e-9)
