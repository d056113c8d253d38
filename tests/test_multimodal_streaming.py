"""Multimodal binary plumbing + streaming lag tests."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from time_sift_spark.operators.multimodal import (
    blob_metadata,
    decode_image,
    extract_features,
)


@pytest.fixture(scope="module")
def blobs(spark):
    rows = [
        (0, bytes.fromhex("FFD8FF") + b"fakejpegdata"),
        (1, bytes.fromhex("89504E47") + b"fakepng"),
        (2, b"RIFFxxxxWAVE"),
        (3, b"plain text bytes"),
        (4, b""),
    ]
    return spark.createDataFrame(rows, "id long, blob binary")


def test_blob_metadata_sniff(blobs):
    out = blob_metadata(blobs, "blob", keep_cols=("id",)).orderBy("id").toPandas()
    assert out.format.tolist() == ["jpeg", "png", "riff", "unknown", "unknown"]
    assert out.size_bytes.tolist() == [15, 11, 12, 16, 0]
    import hashlib

    assert out.blob_md5[3] == hashlib.md5(b"plain text bytes").hexdigest()


def test_decode_image_fake_deterministic(blobs):
    out = decode_image(blobs, "blob", id_col="id", fake=True).orderBy("id").toPandas()
    assert out.format.tolist()[:3] == ["jpeg", "png", "riff"]
    assert ((out.width >= 32) & (out.width < 32 + 993)).all()
    assert (out.channels == 3).all()
    # determinism: second run identical
    out2 = decode_image(blobs, "blob", id_col="id", fake=True).orderBy("id").toPandas()
    pd.testing.assert_frame_equal(out, out2)


def test_decode_image_honest_stub(blobs):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc_info:
        decode_image(blobs, "blob", id_col="id", fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or "PIL" in str(exc_info.value)


def test_extract_features_shape(blobs):
    out = extract_features(blobs, "blob", id_col="id", dim=8).orderBy("id").toPandas()
    assert all(len(v) == 8 for v in out.feature)
    assert all(-1.0 <= x < 1.0 for v in out.feature for x in v)


def test_streaming_lag_matches_batch(spark, tmp_path):
    """Three time-ordered files → three batches; the stateful ring buffer
    must carry lags across batch boundaries exactly like batch F.lag."""
    from time_sift_spark.operators.lag import lag_features
    from time_sift_spark.streaming.lag_stream import run_stream_to_df, streaming_lag_features

    rng = np.random.RandomState(3)
    n, keys = 300, 5
    pdf = pd.DataFrame(
        {
            "t": np.arange(n, dtype="int64"),
            "k": rng.randint(0, keys, n).astype("int64"),
            "v": rng.randn(n),
        }
    )
    src = str(tmp_path / "stream_src")
    for i in range(3):  # non-overlapping time ranges, lexicographic file order
        spark.createDataFrame(pdf.iloc[i * 100 : (i + 1) * 100]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/part{i}")

    stream = (
        spark.readStream.schema("t long, k long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part*")
    )
    out = streaming_lag_features(stream, "v", "t", [1, 3], partition_by="k")
    got = run_stream_to_df(out, "t_stream_test").orderBy("k", "t").toPandas()

    batch = spark.createDataFrame(pdf)
    expected = (
        lag_features(batch, "v", "t", [1, 3], partition_by="k")
        .orderBy("k", "t")
        .toPandas()
        .rename(columns={"v_lag1": "l1", "v_lag3": "l3"})
    )
    np.testing.assert_allclose(got.v_lag1.to_numpy(), expected.l1.to_numpy())
    np.testing.assert_allclose(got.v_lag3.to_numpy(), expected.l3.to_numpy())
    assert len(got) == n


def test_resize_stub(blobs):
    from time_sift_spark.operators.multimodal import resize_image

    out = resize_image(blobs, "blob", id_col="id", width=224, height=224).orderBy("id").toPandas()
    assert (out.width == 224).all() and (out.height == 224).all()
    out2 = resize_image(blobs, "blob", id_col="id", width=224, height=224).orderBy("id").toPandas()
    pd.testing.assert_frame_equal(out, out2)  # deterministic
    out3 = resize_image(blobs, "blob", id_col="id", width=64, height=64).orderBy("id").toPandas()
    assert (out.resized_md5 != out3.resized_md5).all()  # dims feed the hash


def test_sample_frames_stub(blobs):
    from time_sift_spark.operators.multimodal import sample_frames

    out = sample_frames(blobs, "blob", id_col="id", every_n=10).toPandas()
    assert (out.frame_idx % 10 == 0).all()
    assert out.groupby("id").frame_idx.is_monotonic_increasing.all()
    # fan-out: every input blob yields at least one frame row
    assert set(out.id) == {0, 1, 2, 3, 4}


def test_parse_image_header_real_formats():
    """The stdlib parser reads true header fields — non-square dims catch
    width/height transposition, each format exercises its own branch."""
    import struct
    import zlib

    from time_sift_spark.operators.multimodal import parse_image_header, synthesize_png

    # PNG via our own synthesizer (independent IHDR parse check below)
    assert parse_image_header(synthesize_png(17, 43)) == (17, 43, 1)
    # GIF89a logical screen descriptor, little-endian dims
    gif = b"GIF89a" + struct.pack("<HH", 320, 17) + b"\x00" * 6
    assert parse_image_header(gif) == (320, 17, 3)
    # BMP with negative (top-down) height
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 64, -48) + b"\x00" * 10
    assert parse_image_header(bmp) == (64, 48, 3)
    # minimal JPEG: SOI + APP0 + SOF0(h=31, w=77, 3 components)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 31, 77) + b"\x03" + b"\x00" * 9
    assert parse_image_header(b"\xff\xd8" + app0 + sof0) == (77, 31, 3)
    # not an image
    assert parse_image_header(b"plain text bytes") is None


def test_decode_image_real_path_and_loud_failure(spark):
    """fake=False genuinely parses PNG bytes end-to-end through the
    mapInPandas plumbing; unparseable bytes raise, never invent dims."""
    import pandas as pd
    import pytest

    from time_sift_spark.operators.multimodal import decode_image, synthesize_png

    pdf = pd.DataFrame({"vid": [1, 2], "blob": [synthesize_png(5, 9), synthesize_png(200, 3)]})
    out = (
        decode_image(spark.createDataFrame(pdf), "blob", id_col="vid", fake=False)
        .orderBy("vid")
        .toPandas()
    )
    assert list(zip(out.width, out.height, out.channels)) == [(5, 9, 1), (200, 3, 1)]
    assert set(out.format) == {"png"}

    bad = spark.createDataFrame(pd.DataFrame({"vid": [1], "blob": [b"not an image"]}))
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception) as exc:
        decode_image(bad, "blob", id_col="vid", fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(exc.value, NotImplementedError)


def test_decode_audio_real_roundtrip(spark):
    """decode_audio reads back exactly what the wave writer encoded."""
    import pandas as pd

    from time_sift_spark.operators.multimodal import decode_audio, synthesize_wav

    pdf = pd.DataFrame(
        {
            "vid": [1, 2],
            "blob": [synthesize_wav(8000, 1, 123), synthesize_wav(44100, 2, 7)],
        }
    )
    out = (
        decode_audio(spark.createDataFrame(pdf), "blob", id_col="vid")
        .orderBy("vid")
        .toPandas()
    )
    assert list(map(tuple, out[["sample_rate", "channels", "n_frames", "sample_width"]].itertuples(index=False))) == [
        (8000, 1, 123, 2),
        (44100, 2, 7, 2),
    ]


def test_decode_image_pil_path_when_available(spark):
    """Wherever PIL exists, the real path must use it and agree with the
    stdlib header parse AND the resize real branch must run. Skipped in
    containers without PIL (the stdlib parser covers those)."""
    import pytest

    from time_sift_spark.operators import multimodal as mm

    if not mm._HAVE_PIL:
        pytest.skip("PIL not installed — stdlib parser path covered elsewhere")
    import pandas as pd

    png = mm.synthesize_png(12, 34)
    pdf = pd.DataFrame({"vid": [1], "blob": [png]})
    out = mm.decode_image(spark.createDataFrame(pdf), "blob", id_col="vid", fake=False).toPandas()
    assert (out.width[0], out.height[0], out.channels[0]) == (12, 34, 1)
    rz = mm.resize_image(spark.createDataFrame(pdf), "blob", id_col="vid", width=4, height=5, fake=False).toPandas()
    assert (rz.width[0], rz.height[0]) == (4, 5) and len(rz.resized_md5[0]) == 32


def test_streaming_asof_carries_state_across_batches(spark, tmp_path):
    """Two batches: purchases in batch 1 must be visible to clicks in
    batch 2 through the single-scalar state; a late old purchase in the
    final batch becomes 'most recent' for rows after it (arrival-order
    contract)."""
    from time_sift_spark.streaming.lag_stream import (
        run_stream_to_df,
        streaming_asof_join,
    )

    b1 = pd.DataFrame(
        {
            "t": [10, 20, 30],
            "k": [1, 1, 1],
            "typ": ["purchase", "click", "purchase"],
            "v": [100.0, 1.0, 300.0],
        }
    )
    b2 = pd.DataFrame(
        {
            "t": [40, 5, 50],
            "k": [1, 1, 1],
            "typ": ["click", "purchase", "click"],
            "v": [2.0, 999.0, 3.0],
        }
    )
    src = str(tmp_path / "asof_src")
    for i, b in enumerate([b1, b2]):
        spark.createDataFrame(b).coalesce(1).write.mode("overwrite").parquet(
            f"{src}/part{i}"
        )
    stream = (
        spark.readStream.schema("t long, k long, typ string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part*")
    )
    out = streaming_asof_join(
        stream, partition_by="k", time_col="t", type_col="typ",
        left_type="click", right_type="purchase", value_col="v",
    )
    got = {r.t: r.value_asof for r in run_stream_to_df(out, "t_asof_test").collect()}
    # batch1: click@20 sees purchase@10
    assert got[20] == 100.0
    # batch2 sorts by t: purchase@5 processes FIRST (arrival-order), so
    # click@40 sees 999.0 (the late purchase overwrote batch-1 state),
    # click@50 still 999.0
    assert got[40] == 999.0 and got[50] == 999.0


def test_streaming_asof_no_purchase_yields_null(spark, tmp_path):
    from time_sift_spark.streaming.lag_stream import (
        run_stream_to_df,
        streaming_asof_join,
    )

    b = pd.DataFrame({"t": [1], "k": [9], "typ": ["click"], "v": [5.0]})
    src = str(tmp_path / "asof_src2")
    spark.createDataFrame(b).coalesce(1).write.mode("overwrite").parquet(f"{src}/p0")
    stream = (
        spark.readStream.schema("t long, k long, typ string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/p*")
    )
    out = streaming_asof_join(
        stream, partition_by="k", time_col="t", type_col="typ",
        left_type="click", right_type="purchase", value_col="v",
    )
    rows = run_stream_to_df(out, "t_asof_test2").collect()
    assert len(rows) == 1 and rows[0].value_asof is None


# --------------------------------------------------------------------------
# Stdlib PNG pixel codec (decode / unfilter / resize / encode)
# --------------------------------------------------------------------------


def _build_png_with_filters(px, ftypes):
    """PNG whose y-th scanline uses filter type ftypes[y] — forward
    filtering implemented here independently of the decoder under test."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    from time_sift_spark.operators.multimodal import _png_chunk

    h, w, c = px.shape
    stride = w * c
    flat = px.reshape(h, stride).astype(np.int32)
    out_rows = []
    prev = np.zeros(stride, dtype=np.int32)
    for y, f in enumerate(ftypes):
        cur = flat[y]
        a = np.zeros(stride, dtype=np.int32)
        a[c:] = cur[:-c]
        cc = np.zeros(stride, dtype=np.int32)
        cc[c:] = prev[:-c]
        if f == 0:
            filt = cur
        elif f == 1:
            filt = (cur - a) & 0xFF
        elif f == 2:
            filt = (cur - prev) & 0xFF
        elif f == 3:
            filt = (cur - ((a + prev) >> 1)) & 0xFF
        else:
            p = a + prev - cc
            pa, pb, pc = abs(p - a), abs(p - prev), abs(p - cc)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, cc))
            filt = (cur - pred) & 0xFF
        out_rows.append(bytes([f]) + bytes(filt.astype(np.uint8)))
        prev = cur
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2}[c], 0, 0, 0)
    idat = _zlib.compress(b"".join(out_rows))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def test_png_codec_roundtrip_all_channel_counts():
    import numpy as np

    from time_sift_spark.operators.multimodal import decode_png_pixels, encode_png_pixels

    rng = np.random.RandomState(0)
    for c in (1, 2, 3, 4):
        px = rng.randint(0, 256, (13, 17, c), dtype=np.uint8)
        assert (decode_png_pixels(encode_png_pixels(px)) == px).all()


def test_png_decode_all_five_filter_types():
    """Unfiltering correctness against an INDEPENDENT forward filter:
    one scanline per filter type (None/Sub/Up/Average/Paeth)."""
    import numpy as np

    from time_sift_spark.operators.multimodal import decode_png_pixels

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (5, 9, 3), dtype=np.uint8)
    raw = _build_png_with_filters(px, [0, 1, 2, 3, 4])
    assert (decode_png_pixels(raw) == px).all()


def test_png_decode_loud_on_unsupported():
    import struct as _struct
    import zlib as _zlib

    import pytest

    from time_sift_spark.operators.multimodal import _png_chunk, decode_png_pixels

    # 16-bit depth must refuse, not misdecode
    ihdr = _struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    raw = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib.compress(b"\x00" * 10))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        decode_png_pixels(raw)
    with pytest.raises(ValueError):
        decode_png_pixels(b"not a png at all")


def test_resize_image_real_png_no_pil(spark):
    """The real resize path works WITHOUT PIL on PNG input and the
    output digest equals an independently computed expectation."""
    import hashlib

    import numpy as np
    import pandas as pd

    from time_sift_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png_pixels,
        resize_image,
        resize_pixels_nearest,
    )

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (20, 30, 3), dtype=np.uint8)
    blob = encode_png_pixels(px)
    expected = hashlib.md5(
        encode_png_pixels(resize_pixels_nearest(px, 8, 6))
    ).hexdigest()
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "blob": [blob]}))
    out = resize_image(df, "blob", id_col="doc_id", width=8, height=6, fake=False).collect()
    assert out[0].resized_md5 == expected
    # and the digest corresponds to REAL pixels: decode it back
    assert decode_png_pixels(
        encode_png_pixels(resize_pixels_nearest(px, 8, 6))
    ).shape == (6, 8, 3)


def test_y4m_parse_roundtrip_and_real_sampling(spark):
    import hashlib

    import pandas as pd

    from time_sift_spark.operators.multimodal import (
        parse_y4m,
        sample_frames,
        synthesize_y4m,
    )

    raw = synthesize_y4m(8, 6, 13)
    w, h, frames = parse_y4m(raw)
    assert (w, h, len(frames)) == (8, 6, 13)
    ysz, csz = 48, 12
    assert frames[3] == bytes([3]) * ysz + b"\x80" * (2 * csz)

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "blob": [raw]}))
    out = (
        sample_frames(df, "blob", id_col="doc_id", every_n=5, fake=False)
        .toPandas()
        .sort_values("frame_idx")
    )
    assert out.frame_idx.tolist() == [0, 5, 10]
    assert out.frame_md5.tolist()[1] == hashlib.md5(frames[5]).hexdigest()


def test_sample_frames_real_loud_on_compressed(spark):
    import pandas as pd
    import pytest

    from time_sift_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "blob": [b"\x00\x00\x00\x18ftypmp42fakebytes"]})
    )
    out = sample_frames(df, "blob", id_col="doc_id", every_n=5, fake=False)
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_image_dhash_brightness_invariant_and_algebraic():
    """image_dhash over the REAL codec chain must (a) equal the
    algebraic bit derivation from the gradient parameters and (b) be
    invariant under the bounded brightness shift — the two properties
    the registered oracle relies on."""
    from time_sift_spark.operators.multimodal import (
        decode_png_pixels,
        resize_pixels_nearest,
        synthesize_png_gradient,
    )

    def op_hash(a, b, d, w, h):
        px = decode_png_pixels(synthesize_png_gradient(a, b, d, w, h))
        small = resize_pixels_nearest(px[:, :, 0], 9, 8)
        bits = small[:, 1:] > small[:, :-1]
        return "".join(
            f"{sum(int(bits[r, c]) << c for c in range(8)):02x}" for r in range(8)
        )

    def alg_hash(a, b, w, h):
        yi = [min(int((r + 0.5) * h / 8), h - 1) for r in range(8)]
        xi = [min(int((c + 0.5) * w / 9), w - 1) for c in range(9)]
        out = []
        for r in range(8):
            byte = 0
            for c in range(8):
                v1 = (a * yi[r] + b * xi[c]) % 200
                v2 = (a * yi[r] + b * xi[c + 1]) % 200
                byte |= int(v2 > v1) << c
            out.append(f"{byte:02x}")
        return "".join(out)

    import random

    rng = random.Random(7)
    for _ in range(50):
        a, b = 1 + rng.randrange(17), 1 + rng.randrange(13)
        d = rng.randrange(55)
        w, h = 9 + rng.randrange(56), 8 + rng.randrange(57)
        assert op_hash(a, b, d, w, h) == alg_hash(a, b, w, h)
        assert op_hash(a, b, (d + 7) % 55, w, h) == op_hash(a, b, d, w, h)


def test_image_dhash_spark_and_loud_failure(spark):
    import pandas as pd

    from time_sift_spark.operators.multimodal import image_dhash, synthesize_png_gradient

    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2], "blob": [synthesize_png_gradient(3, 5, 10, 20, 15)] * 2}
        )
    )
    out = image_dhash(df, "blob", id_col="doc_id").collect()
    assert len(out) == 2 and out[0].dhash == out[1].dhash
    assert len(out[0].dhash) == 16

    bad = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "blob": [b"GIF89a not a png"]})
    )
    import pytest as _pt

    with _pt.raises(Exception) as ei:
        image_dhash(bad, "blob", id_col="doc_id").collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_audio_energy_hand_case_and_width_gate(spark):
    """Hand-checkable PCM: amp=100, 5 frames, mono → samples
    (100,0,100,0,100): n=5, peak=100, silence 2/5, rms
    sqrt(30000/5); stereo duplicates per channel.  A 1-byte-width WAV
    raises NotImplementedError (loud, never made-up numbers)."""
    import io
    import math
    import wave

    import pandas as pd
    import pytest as _pt

    from time_sift_spark.operators.multimodal import (
        audio_energy,
        synthesize_wav_square,
    )

    mono = synthesize_wav_square(8000, 1, 5, 100)
    stereo = synthesize_wav_square(16000, 2, 5, 100)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "blob": [mono, stereo]})
    )
    out = audio_energy(df, "blob", id_col="doc_id").toPandas().set_index("doc_id")
    assert out.loc[1, "n_samples"] == 5 and out.loc[2, "n_samples"] == 10
    assert (out.peak == 100).all()
    assert out.loc[1, "silence_ratio"] == 2 / 5
    assert out.loc[1, "rms"] == math.sqrt((100 * 100 * 3) / 5)
    assert out.loc[2, "silence_ratio"] == 4 / 10
    assert out.loc[2, "rms"] == math.sqrt((100 * 100 * 6) / 10)

    # 8-bit PCM: unsupported width must raise loudly at executor time
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(b"\x40" * 10)
    bad = spark.createDataFrame(pd.DataFrame({"doc_id": [3], "blob": [buf.getvalue()]}))
    with _pt.raises(Exception, match="16-bit"):
        audio_energy(bad, "blob", id_col="doc_id").collect()


def test_scene_changes_hand_case_and_codec_gate(spark):
    """step=200 over 4 frames: lumas 0,200,144,88 → diffs 200,56,56 →
    cut only at frame 1 with threshold 64; non-y4m bytes raise loudly."""
    import pandas as pd
    import pytest as _pt

    from time_sift_spark.operators.multimodal import scene_changes, synthesize_y4m

    vid = synthesize_y4m(8, 8, 4, step=200)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "blob": [vid]}))
    out = (
        scene_changes(df, "blob", id_col="doc_id")
        .toPandas().sort_values("frame_idx").reset_index(drop=True)
    )
    assert list(out.frame_idx) == [1, 2, 3]
    assert list(out.mean_abs_diff) == [200.0, 56.0, 56.0]
    assert list(out.is_cut) == [True, False, False]

    bad = spark.createDataFrame(pd.DataFrame({"doc_id": [2], "blob": [b"mp4 junk"]}))
    with _pt.raises(Exception, match="y4m"):
        scene_changes(bad, "blob", id_col="doc_id").collect()


def test_scene_changes_stride_samples_and_validates(spark):
    """stride=2 over 6 frames of step=200: sampled lumas at 0,2,4 are
    0,144,32 → diffs |144-0|=144, |32-144|=112 at frame_idx 2,4; the
    intermediate cut at frame 1 is deliberately not visible (the
    documented recall trade)."""
    import pandas as pd
    import pytest as _pt

    from time_sift_spark.operators.multimodal import scene_changes, synthesize_y4m

    vid = synthesize_y4m(8, 8, 6, step=200)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "blob": [vid]}))
    out = (
        scene_changes(df, "blob", id_col="doc_id", stride=2)
        .toPandas().sort_values("frame_idx").reset_index(drop=True)
    )
    assert list(out.frame_idx) == [2, 4]
    assert list(out.mean_abs_diff) == [144.0, 112.0]
    with _pt.raises(ValueError):
        scene_changes(df, "blob", id_col="doc_id", stride=0)


def test_scene_changes_color_catches_chroma_only_cut(spark):
    """A color-only cut (luma steady, chroma jumps 200) is INVISIBLE to
    the luma detector (mean_abs_diff 0) but over-threshold for the
    color detector's combined MAD; per-plane MADs follow the mod-256
    closed forms exactly."""
    import pandas as pd

    from time_sift_spark.operators.multimodal import (
        scene_changes,
        scene_changes_color,
        synthesize_y4m_color,
    )

    # luma static (ystep=0 is disallowed by synthesize? step 0 fine: f*0=0),
    # chroma steps 200: U lumas 0,200,144; V same.
    vid = synthesize_y4m_color(8, 8, 3, ystep=0, ustep=200, vstep=200)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "blob": [vid]}))
    luma = (
        scene_changes(df, "blob", id_col="doc_id")
        .toPandas().sort_values("frame_idx").reset_index(drop=True)
    )
    assert list(luma.mean_abs_diff) == [0.0, 0.0]
    assert not luma.is_cut.any()

    color = (
        scene_changes_color(df, "blob", id_col="doc_id")
        .toPandas().sort_values("frame_idx").reset_index(drop=True)
    )
    assert list(color.mad_y) == [0.0, 0.0]
    assert list(color.mad_u) == [200.0, 56.0]
    assert list(color.mad_v) == [200.0, 56.0]
    # 8x8 4:2:0: ysz=64, csz=16, total=96
    assert list(color.mad_all) == [
        (200 * 16 + 200 * 16) / 96,
        (56 * 16 + 56 * 16) / 96,
    ]
    assert list(color.is_cut) == [True, False]


def test_audio_energy_channels_catches_dead_channel(spark):
    """A stereo clip with one live and one dead channel: the POOLED
    panel reports a plausible nonzero RMS and 75% silence, but the
    per-channel panel isolates channel 1 as fully silent — the
    channel-health gate.  Closed forms: live channel = the mono
    square-wave stats."""
    import io
    import math
    import wave

    import pandas as pd

    from time_sift_spark.operators.multimodal import (
        audio_energy,
        audio_energy_channels,
    )

    # hand-build: ch0 alternates (100, 0), ch1 all zero, 5 frames
    frames = bytearray()
    for i in range(5):
        s0 = 100 if i % 2 == 0 else 0
        frames += int(s0).to_bytes(2, "little", signed=True)
        frames += (0).to_bytes(2, "little", signed=True)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(bytes(frames))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "blob": [buf.getvalue()]})
    )

    pooled = audio_energy(df, "blob", id_col="doc_id").toPandas()
    assert pooled.loc[0, "silence_ratio"] == 7 / 10  # dead ch masked
    assert pooled.loc[0, "rms"] == math.sqrt(100 * 100 * 3 / 10)

    per = (
        audio_energy_channels(df, "blob", id_col="doc_id")
        .toPandas().sort_values("channel").reset_index(drop=True)
    )
    assert list(per.channel) == [0, 1]
    assert list(per.n_samples) == [5, 5]
    assert list(per.peak) == [100, 0]
    assert per.loc[0, "silence_ratio"] == 2 / 5
    assert per.loc[0, "rms"] == math.sqrt(100 * 100 * 3 / 5)
    assert per.loc[1, "silence_ratio"] == 1.0
    assert per.loc[1, "rms"] == 0.0


def test_audio_energy_channels_multi_amp_closed_forms(spark):
    """synthesize_wav_square_multi: 3 channels at amps 50/100/150 —
    each channel's panel matches its closed form independently."""
    import math

    import pandas as pd

    from time_sift_spark.operators.multimodal import (
        audio_energy_channels,
        synthesize_wav_square_multi,
    )

    blob = synthesize_wav_square_multi(16000, 3, 7, 50)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "blob": [blob]}))
    per = (
        audio_energy_channels(df, "blob", id_col="doc_id")
        .toPandas().sort_values("channel").reset_index(drop=True)
    )
    assert list(per.peak) == [50, 100, 150]
    for c in range(3):
        amp = 50 * (c + 1)
        assert per.loc[c, "n_samples"] == 7
        assert per.loc[c, "silence_ratio"] == 3 / 7
        assert per.loc[c, "rms"] == math.sqrt(amp * amp * 4 / 7)


def test_session_paths_and_streaming_twin(spark, tmp_path):
    """Hand case: user 1 has two sessions (gap > 30 min splits), user 2
    one session sharing user 1's first journey; max_steps truncation
    applies within a session.  The streaming twin over a file replay
    returns the identical top-path relation."""
    import pandas as pd

    from time_sift_spark.operators.funnel import (
        session_paths_sql,
        streaming_top_paths,
    )
    from time_sift_spark.functions.text_fns import SPARK as _S

    rows = []
    base = pd.Timestamp("2024-01-01 00:00:00")
    # user 1, session A: a>b ; session B (2h later): c
    rows += [(1, "a", base, 1), (1, "b", base + pd.Timedelta(minutes=5), 2),
             (1, "c", base + pd.Timedelta(hours=2), 3)]
    # user 2, one session: a>b
    rows += [(2, "a", base, 4), (2, "b", base + pd.Timedelta(minutes=10), 5)]
    pdf = pd.DataFrame(rows, columns=["user_id", "event_type", "ts", "event_id"])
    df = spark.createDataFrame(pdf)
    df.createOrReplaceTempView("_t_spaths")
    batch = spark.sql(session_paths_sql(
        _S, "_t_spaths", "user_id", "event_type", "ts", "event_id",
        gap_minutes=30, max_steps=2, top_k=10,
    )).toPandas()
    assert list(batch.path) == ["a>b", "c"]
    assert list(batch.n_sessions) == [2, 1]

    src = str(tmp_path / "spaths_parquet")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = streaming_top_paths(
        stream, "user_id", "event_type", "ts", "event_id",
        gap_minutes=30, max_steps=2, top_k=10,
        query_name="t_spaths_stream",
    ).toPandas()
    assert list(out.path) == ["a>b", "c"]
    assert list(out.n_sessions) == [2, 1]
