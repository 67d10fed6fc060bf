"""Multimodal binary-column plumbing: schema, batch shape, stub gating."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hive_cassandra_spark.operators import multimodal


def _payloads(spark, sf_dir, n=40):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") < n)
    return multimodal.attach_payload(docs)


def test_payload_roundtrip_bytes(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") < 10)
    texts = {r.doc_id: r.text for r in docs.collect()}
    out = _payloads(spark, sf_dir, 10).collect()
    for r in out:
        assert bytes(r.payload) == texts[r.doc_id].encode("utf-8")
        assert r.meta.format == "fake/raw" and r.meta.width >= 16


def test_extract_features_fake_kernel(spark, sf_dir):
    out = multimodal.extract_features(_payloads(spark, sf_dir), fake=True).collect()
    assert len(out) == 40
    for r in out:
        assert len(r.features) == multimodal.FEATURE_BINS
        assert abs(sum(r.features) - 1.0) < 1e-4  # normalized histogram


def test_extract_features_matches_numpy(spark, sf_dir):
    pdf = _payloads(spark, sf_dir, 5).collect()
    out = {r.doc_id: r.features for r in
           multimodal.extract_features(_payloads(spark, sf_dir, 5), fake=True).collect()}
    for r in pdf:
        arr = np.frombuffer(bytes(r.payload), dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=16).astype("float64")
        hist = (hist / hist.sum()).round(6)
        assert np.allclose(out[r.doc_id], hist)


def test_real_decode_unsupported_format_is_stubbed(spark, sf_dir):
    """Formats that genuinely need ffmpeg still raise at the decode
    dispatch; raw/BMP/PNG/GIF/WAV/JPEG are real paths now (JPEG joined in
    round 7 — a payload merely LABELED jpeg fails its SOI check instead
    of hitting a stub)."""
    src = _payloads(spark, sf_dir, 2).withColumn(
        "meta",
        F.struct(
            F.lit("video/mp4").alias("format"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.n_frames").alias("n_frames"),
        ),
    )
    with pytest.raises(Exception, match="NotImplementedError|absent codec|ffmpeg"):
        multimodal.extract_features(src, fake=False).collect()
    with pytest.raises(Exception, match="ValueError|SOI"):
        multimodal.decode_jpeg_gray8(b"plainly not a jpeg")


def test_bmp_codec_roundtrip():
    rng = np.random.default_rng(7)
    for w, h in [(16, 16), (17, 5), (63, 48), (1, 1)]:
        pixels = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        data = multimodal.encode_bmp_gray8(pixels)
        assert data[:2] == b"BM"
        # stride padding means non-multiple-of-4 widths change the file size
        dw, dh, out = multimodal.decode_bmp_gray8(data)
        assert (dw, dh) == (w, h)
        assert np.array_equal(out, pixels)


def test_wav_codec_roundtrip():
    rng = np.random.default_rng(11)
    samples = rng.integers(-32768, 32768, size=777, dtype=np.int16)
    data = multimodal.encode_wav_pcm16(samples, sample_rate=8000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    rate, out = multimodal.decode_wav_pcm16(data)
    assert rate == 8000
    assert np.array_equal(out, samples)


def test_attach_image_payload_real_bmp_decode(spark, sf_dir):
    """attach_image_payload emits spec-compliant BMPs whose decoded pixel
    plane is the text truncated/zero-padded to w*h — verified by decoding
    the collected payload bytes driver-side."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") < 8)
    texts = {r.doc_id: r.text for r in docs.collect()}
    for r in multimodal.attach_image_payload(docs).collect():
        w, h, pixels = multimodal.decode_bmp_gray8(bytes(r.payload))
        assert (w, h) == (r.meta.width, r.meta.height)
        want = texts[r.doc_id].encode("utf-8")[: w * h].ljust(w * h, b"\x00")
        assert pixels.tobytes() == want
        assert r.meta.format == "image/bmp"


def test_real_features_bmp_and_wav_match_fake_of_content(spark, sf_dir):
    """fake=False features of a BMP/WAV payload must equal fake=True
    features of the underlying content bytes — decode really inverts the
    encode. WAV carries the full text (no truncation), so its features
    equal the raw-payload fake features exactly."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") < 12)
    fake_raw = {
        r.doc_id: r.features
        for r in multimodal.extract_features(
            multimodal.attach_payload(docs), fake=True
        ).collect()
    }
    real_wav = {
        r.doc_id: r.features
        for r in multimodal.extract_features(
            multimodal.attach_audio_payload(docs), fake=False
        ).collect()
    }
    assert real_wav == fake_raw
    real_bmp = multimodal.extract_features(
        multimodal.attach_image_payload(docs), fake=False
    ).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    for r in real_bmp:
        w = r.doc_id % 64 + 16
        h = r.doc_id % 48 + 16
        content = texts[r.doc_id].encode("utf-8")[: w * h].ljust(w * h, b"\x00")
        arr = np.frombuffer(content, dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=16).astype("float64")
        assert np.allclose(r.features, (hist / hist.sum()).round(6))


def test_resize_real_bmp_reencodes(spark, sf_dir):
    """fake=False resize of a BMP payload: decode → nn-resample → re-encode;
    output is a valid BMP of the target geometry."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") < 4)
    src = multimodal.attach_image_payload(docs)
    for r in multimodal.resize(src, 8, 4, fake=False).collect():
        w, h, pixels = multimodal.decode_bmp_gray8(bytes(r.payload))
        assert (w, h) == (8, 4)
        assert pixels.shape == (4, 8)


def test_resize_real_raw_kernel(spark, sf_dir):
    """fake=False on the raw format: nearest-neighbor numpy resample,
    verified against a direct numpy computation."""
    src = _payloads(spark, sf_dir, 4)
    metas = {r.doc_id: (r.meta.width, r.meta.height) for r in src.collect()}
    payloads = {r.doc_id: bytes(r.payload) for r in src.collect()}
    out = {r.doc_id: bytes(r.payload)
           for r in multimodal.resize(src, 8, 4, fake=False).collect()}
    for doc_id, (sw, sh) in metas.items():
        size = sw * sh
        arr = np.frombuffer(
            payloads[doc_id][:size].ljust(size, b"\x00"), dtype=np.uint8
        ).reshape(sh, sw)
        rows = np.arange(4) * sh // 4
        cols = np.arange(8) * sw // 8
        assert out[doc_id] == arr[rows][:, cols].tobytes()
        assert len(out[doc_id]) == 32


def test_frame_sample_real_raw_kernel(spark, sf_dir):
    src = _payloads(spark, sf_dir, 4)
    out = multimodal.frame_sample(src, n_frames=3, fake=False).collect()
    assert len(out) == 12
    metas = {r.doc_id: r.meta.width * r.meta.height for r in src.collect()}
    for r in out:
        assert len(bytes(r.frame)) == metas[r.doc_id]
    assert {r.frame_idx for r in out} == {0, 1, 2}


def test_resize_non_raw_format_stubbed(spark, sf_dir):
    import pytest
    from pyspark.sql import functions as F

    src = _payloads(spark, sf_dir, 2).withColumn(
        "meta",
        F.struct(
            F.lit("image/jpeg").alias("format"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.n_frames").alias("n_frames"),
        ),
    )
    with pytest.raises(Exception, match="NotImplementedError|PIL|PythonException"):
        multimodal.resize(src, 8, 4, fake=False).collect()


def test_resize_and_frame_sample_shapes(spark, sf_dir):
    resized = multimodal.resize(_payloads(spark, sf_dir, 6), 8, 4, fake=True).collect()
    assert all(len(bytes(r.payload)) == 32 for r in resized)
    frames = multimodal.frame_sample(_payloads(spark, sf_dir, 6), n_frames=3, fake=True).collect()
    assert len(frames) == 18
    assert {r.frame_idx for r in frames} == {0, 1, 2}


def test_png_codec_roundtrip():
    rng = np.random.default_rng(13)
    for w, h in [(16, 16), (17, 5), (63, 48), (1, 1)]:
        pixels = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        data = multimodal.encode_png_gray8(pixels)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        dw, dh, out = multimodal.decode_png_gray8(data)
        assert (dw, dh) == (w, h)
        assert np.array_equal(out, pixels)


def test_png_decoder_handles_all_filters():
    """The decoder must reverse every PNG scanline filter type, not just
    the Up filter our encoder emits — hand-build a 4-row image using
    None/Sub/Average/Paeth against known reconstructed rows."""
    import struct
    import zlib

    recon = np.array(
        [[10, 20, 30, 40], [12, 22, 32, 42], [20, 30, 40, 50], [25, 35, 45, 55]],
        dtype=np.uint8,
    )
    lines = []
    prev = np.zeros(4, dtype=np.int32)
    for y, ftype in enumerate([0, 1, 3, 4]):
        row = recon[y].astype(np.int32)
        if ftype == 0:
            raw = row
        elif ftype == 1:  # Sub: raw[x] = row[x] - row[x-1]
            raw = row - np.concatenate(([0], row[:-1]))
        elif ftype == 3:  # Average
            left = np.concatenate(([0], row[:-1]))
            raw = row - (left + prev) // 2
        else:  # Paeth
            raw = row.copy()
            for x in range(4):
                a = int(row[x - 1]) if x else 0
                b = int(prev[x])
                c = int(prev[x - 1]) if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                raw[x] = row[x] - pred
        lines.append(bytes([ftype]) + (raw & 0xFF).astype(np.uint8).tobytes())
        prev = row

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    w, h, out = multimodal.decode_png_gray8(data)
    assert (w, h) == (4, 4)
    assert np.array_equal(out, recon)


def test_attach_image_payload_real_png_decode(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") < 8)
    texts = {r.doc_id: r.text for r in docs.collect()}
    for r in multimodal.attach_image_payload(docs, container="png").collect():
        w, h, pixels = multimodal.decode_png_gray8(bytes(r.payload))
        assert (w, h) == (r.meta.width, r.meta.height)
        want = texts[r.doc_id].encode("utf-8")[: w * h].ljust(w * h, b"\x00")
        assert pixels.tobytes() == want
        assert r.meta.format == "image/png"


def test_resize_real_png_reencodes(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") < 6)
    src = multimodal.attach_image_payload(docs, container="png")
    out = multimodal.resize(src, 8, 8, fake=False).collect()
    assert len(out) == 6
    for r in out:
        w, h, pixels = multimodal.decode_png_gray8(bytes(r.payload))
        assert (w, h) == (8, 8) and pixels.shape == (8, 8)


def test_gif_codec_roundtrip():
    """encode_gif_gray8 → decode_gif_gray8 is identity across shapes that
    cross the LZW width-growth (512/1024/2048/4096) and table-reset
    boundaries, for random, structured, and constant pixel planes."""
    import numpy as np

    rng = np.random.default_rng(11)
    for shape in [(1, 1), (3, 5), (17, 23), (64, 80), (90, 90)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        w, h, back = multimodal.decode_gif_gray8(multimodal.encode_gif_gray8(px))
        assert (w, h) == (shape[1], shape[0])
        assert np.array_equal(back, px)
    runs = np.tile(np.arange(100, dtype=np.uint8), (120, 2))  # long runs
    assert np.array_equal(multimodal.decode_gif_gray8(multimodal.encode_gif_gray8(runs))[2], runs)
    flat = np.full((100, 100), 7, dtype=np.uint8)  # maximal repetition
    assert np.array_equal(multimodal.decode_gif_gray8(multimodal.encode_gif_gray8(flat))[2], flat)


def test_gif_decoder_external_vector():
    """The canonical 1x1 transparent GIF89a (a real-world byte vector, not
    produced by this encoder): GIF89a signature, graphic-control
    extension, 2-entry palette, 2-bit LZW with truncated EOI — all paths
    our own encoder never exercises."""
    import base64

    import numpy as np

    tiny = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    w, h, px = multimodal.decode_gif_gray8(tiny)
    assert (w, h) == (1, 1)
    assert px.dtype == np.uint8 and px[0, 0] == 0  # palette[0] is black


def test_attach_image_payload_real_gif_decode(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(8)
    out = multimodal.attach_image_payload(docs, container="gif").collect()
    for r in out:
        assert bytes(r.payload[:6]) == b"GIF87a"
        w, h, px = multimodal.decode_gif_gray8(bytes(r.payload))
        assert (w, h) == (r.meta.width, r.meta.height)
        assert px.shape == (r.meta.height, r.meta.width)


def test_resize_real_gif_reencodes(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(4)
    payloads = multimodal.attach_image_payload(docs, container="gif")
    out = multimodal.resize(payloads, 20, 12, fake=False).collect()
    for r in out:
        w, h, px = multimodal.decode_gif_gray8(bytes(r.payload))
        assert (w, h) == (20, 12) and px.shape == (12, 20)


def test_ulaw_involution_and_anchors():
    """G.711 mu-law: encode(decode(b)) == b for every code except 0x7F
    (negative zero, which re-encodes as positive zero 0xFF — the spec's
    one degenerate pair); silence encodes to 0xFF; quantization error is
    bounded by the segment step."""
    codes = np.arange(256, dtype=np.uint8)
    back = multimodal.encode_ulaw(multimodal.decode_ulaw(codes))
    diff = np.nonzero(back != codes)[0]
    assert diff.tolist() == [0x7F]
    assert back[0x7F] == 0xFF
    assert multimodal.encode_ulaw(np.array([0], dtype=np.int16))[0] == 0xFF
    x = np.linspace(-32000, 32000, 10001).astype(np.int16)
    err = np.abs(
        multimodal.decode_ulaw(multimodal.encode_ulaw(x)).astype(np.int32)
        - x.astype(np.int32)
    )
    assert err.max() <= 512  # half the top-segment step
    mid = err[4900:5100]  # |x| <= ~640: segment 2, step 32
    assert mid.max() <= 16


def test_wav_ulaw_container_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.integers(-32000, 32000, size=4000).astype(np.int16)
    buf = multimodal.encode_wav_ulaw(x, 8000)
    rate, back = multimodal.decode_wav_ulaw(buf)
    assert rate == 8000
    assert np.array_equal(
        back, multimodal.decode_ulaw(multimodal.encode_ulaw(x))
    )
    # PCM reader refuses the mu-law format code, naming the right path
    with pytest.raises(NotImplementedError, match="fmt=7"):
        multimodal.decode_wav_pcm16(buf)


def test_animated_gif_roundtrip_and_frame_sample(spark):
    """encode_gif_gray8_frames → decode_gif_gray8_frames is identity per
    frame, and frame_sample(fake=False) pulls evenly-spaced REAL frames
    out of the animated container."""
    rng = np.random.default_rng(5)
    frs = [rng.integers(0, 256, size=(9, 11), dtype=np.uint8) for _ in range(6)]
    buf = multimodal.encode_gif_gray8_frames(frs, delay_cs=4)
    assert bytes(buf[:6]) == b"GIF89a"
    w, h, back = multimodal.decode_gif_gray8_frames(buf)
    assert (w, h) == (11, 9) and len(back) == 6
    assert all(np.array_equal(a, b) for a, b in zip(back, frs))

    df = spark.createDataFrame(
        [(1, bytearray(buf), ("image/gif", 11, 9, 6))],
        f"doc_id long, payload binary, meta {multimodal.META_SCHEMA}",
    )
    out = multimodal.frame_sample(df, n_frames=3, fake=False).collect()
    assert [r.frame_idx for r in out] == [0, 1, 2]
    # evenly spaced: frame indices 0, 2, 4 of the 6
    for r, src in zip(out, (0, 2, 4)):
        assert bytes(r.frame) == frs[src].tobytes()


def test_audio_sample_stats_ulaw_vs_direct(spark, sf_dir):
    """The stats kernel's numbers equal a direct numpy replay of the
    quantize+expand pipeline on the source text bytes."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(6)
    pay = multimodal.attach_audio_payload(docs, container="ulaw")
    got = {r.doc_id: r for r in multimodal.audio_sample_stats(pay).collect()}
    for r in docs.collect():
        raw = np.frombuffer(r.text.encode("utf-8"), dtype=np.uint8)
        x = (raw.astype(np.int16) - 128) << 8
        s = multimodal.decode_ulaw(multimodal.encode_ulaw(x)).astype(np.int64)
        g = got[r.doc_id]
        assert (g.n_samples, g.sum_samples, g.min_sample, g.max_sample) == (
            s.size, int(s.sum()), int(s.min()), int(s.max())
        )


def test_lzw_roundtrip_fuzz():
    """Property: _lzw_decode inverts _lzw_encode for arbitrary byte
    strings (hypothesis), including empty input and low-entropy runs that
    stress the table-reset path."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=3000))
    def check(data):
        enc = multimodal._lzw_encode(data, 8)
        assert multimodal._lzw_decode(enc, 8, len(data)) == data

    check()


def test_ulaw_quantizer_idempotent_fuzz():
    """Property: re-encoding a decoded signal is a fixpoint — the
    quantizer maps every sample onto its reconstruction level exactly
    once (hypothesis over random int16 signals)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=500))
    def check(xs):
        x = np.array(xs, dtype=np.int16)
        c1 = multimodal.encode_ulaw(x)
        c2 = multimodal.encode_ulaw(multimodal.decode_ulaw(c1))
        # negative zero (0x7F) legitimately re-encodes as positive zero
        same = (c1 == c2) | ((c1 == 0x7F) & (c2 == 0xFF))
        assert bool(same.all())

    check()


# ------------------------------------------------------------- JPEG (T.81)


def test_jpeg_constant_blocks_roundtrip_exact():
    """Constant 8x8 blocks carry only a DC coefficient; the default
    table's DC step is 1, so the lossy codec is EXACT on this subset —
    the q127 oracle's premise."""
    rng = np.random.RandomState(11)
    blocks = rng.randint(0, 256, (4, 7), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    data = multimodal.encode_jpeg_gray8(img)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    w, h, dec = multimodal.decode_jpeg_gray8(data)
    assert (w, h) == (56, 32)
    assert (dec == img).all()


def test_jpeg_flat_table_near_lossless_any_image():
    """With an all-ones quantization table the only loss is FDCT
    rounding: error must stay within 1 LSB for arbitrary content, and
    the AC path (runs, ZRL, magnitudes) is genuinely exercised."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (24, 31), dtype=np.uint8)
    q1 = np.ones((8, 8), dtype=np.int64)
    data = multimodal.encode_jpeg_gray8(img, qtable=q1)
    w, h, dec = multimodal.decode_jpeg_gray8(data)
    assert (w, h) == (31, 24)  # non-multiple-of-8 dims survive
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_jpeg_default_table_lossy_but_bounded():
    """The default (frequency-ramp) table is genuinely lossy on noise but
    reconstruction must stay within the table's worst-case half-step
    bound; smooth gradients come back within a couple of levels."""
    rng = np.random.RandomState(9)
    noise = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    _, _, dec = multimodal.decode_jpeg_gray8(multimodal.encode_jpeg_gray8(noise))
    assert np.abs(dec.astype(int) - noise.astype(int)).max() <= 64
    yy, xx = np.mgrid[0:19, 0:22]
    grad = ((yy * 7 + xx * 3) % 256).astype(np.uint8)
    _, _, dg = multimodal.decode_jpeg_gray8(multimodal.encode_jpeg_gray8(grad))
    assert np.abs(dg.astype(int) - grad.astype(int)).max() <= 4


def test_jpeg_decoder_rejects_out_of_scope_streams():
    import struct as _s

    with pytest.raises(ValueError, match="SOI"):
        multimodal.decode_jpeg_gray8(b"nope")
    # extended sequential (SOF1) explicitly out of scope (progressive
    # SOF2 became a real decode path in round 8 — tested below)
    img = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(multimodal.encode_jpeg_gray8(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC1
    with pytest.raises(NotImplementedError, match="SOF0"):
        multimodal.decode_jpeg_gray8(bytes(data))


def test_jpeg_dc_prediction_spans_blocks():
    """DPCM DC coding: a long run of blocks with rising levels decodes
    correctly only if the differential chain is applied in raster order."""
    blocks = np.arange(0, 256, 8, dtype=np.uint8).reshape(4, 8)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    _, _, dec = multimodal.decode_jpeg_gray8(multimodal.encode_jpeg_gray8(img))
    assert (dec == img).all()


def test_attach_image_payload_real_jpeg_decode(spark, sf_dir):
    """The q127 fixture contract: one constant 8x8 block per text byte,
    decoded EXACTLY by the real T.81 path."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") < 8)
    texts = {r.doc_id: r.text for r in docs.collect()}
    for r in multimodal.attach_image_payload(docs, container="jpeg").collect():
        w, h, pixels = multimodal.decode_jpeg_gray8(bytes(r.payload))
        assert (w, h) == (r.meta.width, r.meta.height)
        bw, bh = w // 8, h // 8
        raw = texts[r.doc_id].encode("utf-8")[: bw * bh].ljust(bw * bh, b"\x00")
        blocks = np.frombuffer(raw, dtype=np.uint8).reshape(bh, bw)
        want = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
        assert (pixels == want).all()
        assert r.meta.format == "image/jpeg"


def test_jpeg_flat_table_roundtrip_fuzz():
    """Property: for ANY uint8 image and the all-ones table, decode is
    within 1 LSB of the source at every pixel, any dimensions (including
    non-multiples of 8); dims always survive exactly."""
    from hypothesis import given, settings, strategies as st

    q1 = np.ones((8, 8), dtype=np.int64)

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1)
    )
    def check(w, h, seed):
        img = np.random.RandomState(seed).randint(
            0, 256, (h, w), dtype=np.uint8
        )
        dw, dh, dec = multimodal.decode_jpeg_gray8(
            multimodal.encode_jpeg_gray8(img, qtable=q1)
        )
        assert (dw, dh) == (w, h)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1

    check()


def test_color_jpeg_constant_blocks_exact():
    rng = np.random.RandomState(7)
    by_ = rng.randint(0, 256, (3, 4), dtype=np.uint8)
    bi = by_.astype(np.int64)
    rgb_blocks = np.stack(
        [bi, (bi * 7 + 31) % 256, (bi * 13 + 101) % 256], axis=-1
    ).astype(np.uint8)
    rgb = np.repeat(np.repeat(rgb_blocks, 8, 0), 8, 1)
    w, h, ycc = multimodal.decode_jpeg_color444(
        multimodal.encode_jpeg_color444(rgb)
    )
    assert (w, h) == (32, 24)
    # constant blocks carry only DC; DC step 1 on both tables →
    # decoded planes equal the pinned-rounding conversion EXACTLY
    assert np.array_equal(ycc, multimodal.rgb_to_ycbcr(rgb))


def test_color_jpeg_primary_color_constants():
    # the well-known BT.601 anchors: red→(76,85,255), green→(150,44,21),
    # blue→(29,255,107) — an external ground truth, not a self-check
    for rgb_const, expect in [
        ((255, 0, 0), (76, 85, 255)),
        ((0, 255, 0), (150, 44, 21)),
        ((0, 0, 255), (29, 255, 107)),
    ]:
        img = np.zeros((8, 8, 3), dtype=np.uint8)
        img[:] = rgb_const
        _w, _h, ycc = multimodal.decode_jpeg_color444(
            multimodal.encode_jpeg_color444(img)
        )
        assert tuple(int(x) for x in ycc[0, 0]) == expect, (rgb_const, ycc[0, 0])


def test_color_jpeg_lossy_bound_and_rgb_roundtrip():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (17, 23, 3), dtype=np.uint8)
    w, h, ycc = multimodal.decode_jpeg_color444(
        multimodal.encode_jpeg_color444(img)
    )
    assert (w, h) == (23, 17)
    # worst-case quantization error bound: half a step per coefficient,
    # ramped tables → generous but finite bound on noise input
    err = np.abs(ycc.astype(int) - multimodal.rgb_to_ycbcr(img).astype(int))
    assert err.max() <= 60
    rgb_back = multimodal.ycbcr_to_rgb(ycc)
    assert np.abs(rgb_back.astype(int) - img.astype(int)).max() <= 100
    # smooth content decodes much tighter
    grad = np.zeros((16, 16, 3), dtype=np.uint8)
    grad[..., 0] = np.arange(16, dtype=np.uint8)[None, :] * 4
    grad[..., 1] = 128
    grad[..., 2] = np.arange(16, dtype=np.uint8)[:, None] * 4
    _w, _h, ycc2 = multimodal.decode_jpeg_color444(
        multimodal.encode_jpeg_color444(grad)
    )
    err2 = np.abs(ycc2.astype(int) - multimodal.rgb_to_ycbcr(grad).astype(int))
    assert err2.max() <= 8


def test_color_jpeg_rejects_unsupported():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    enc = bytearray(multimodal.encode_jpeg_color444(img))
    # tamper component 1's sampling byte in SOF0 (id,samp,qtab triples)
    sof_at = bytes(enc).find(b"\xff\xc0")
    assert sof_at > 0
    samp_at = sof_at + 4 + 6 + 1  # marker+len+precision/h/w/ncomp, comp0.samp
    assert enc[samp_at] == 0x11
    enc[samp_at] = 0x22
    with pytest.raises(NotImplementedError):
        multimodal.decode_jpeg_color444(bytes(enc))
    # the gray decoder refuses 3-component streams rather than misreading
    with pytest.raises(NotImplementedError):
        multimodal.decode_jpeg_gray8(multimodal.encode_jpeg_color444(img))
    # and the color decoder refuses single-component (gray) streams
    with pytest.raises(NotImplementedError):
        multimodal.decode_jpeg_color444(
            multimodal.encode_jpeg_gray8(np.zeros((8, 8), dtype=np.uint8))
        )


def test_jpeg_420_constant_macroblocks_exact():
    rng = np.random.RandomState(3)
    by_ = rng.randint(0, 256, (2, 3), dtype=np.uint8)
    bi = by_.astype(np.int64)
    rgb_blocks = np.stack(
        [bi, (bi * 7 + 31) % 256, (bi * 13 + 101) % 256], axis=-1
    ).astype(np.uint8)
    rgb = np.repeat(np.repeat(rgb_blocks, 16, 0), 16, 1)
    w, h, ycc = multimodal.decode_jpeg_color420(
        multimodal.encode_jpeg_color420(rgb)
    )
    assert (w, h) == (48, 32)
    # 2x2 chroma averaging inside constant macro-blocks is lossless, so
    # subsample + DC quantize + replicate-upsample reproduces exactly
    assert np.array_equal(ycc, multimodal.rgb_to_ycbcr(rgb))


def test_jpeg_420_odd_dims_and_lossy_bound():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (19, 21, 3), dtype=np.uint8)
    w, h, ycc = multimodal.decode_jpeg_color420(
        multimodal.encode_jpeg_color420(img)
    )
    assert (w, h) == (21, 19)
    conv = multimodal.rgb_to_ycbcr(img)
    # Y is full-resolution: only quantization error
    assert np.abs(ycc[..., 0].astype(int) - conv[..., 0].astype(int)).max() <= 40
    # chroma contract: decode equals subsample→quantize→replicate, so
    # compare against the subsampled-then-replicated reference (vs the
    # full-res conversion the averaging loss is content-dependent and
    # unbounded on noise) — what remains is quantization error only
    for c in (1, 2):
        full = conv[..., c].astype(np.float64)
        padded = np.empty((32, 32))
        padded[:19, :21] = full
        padded[19:, :21] = full[-1:, :]
        padded[:19, 21:] = padded[:19, 20:21]
        padded[19:, 21:] = padded[18, 20]
        sub = np.floor(
            padded.reshape(16, 2, 16, 2).mean(axis=(1, 3)) + 0.5
        )
        ref = np.repeat(np.repeat(sub, 2, 0), 2, 1)[:19, :21]
        assert np.abs(ycc[..., c].astype(int) - ref.astype(int)).max() <= 60


def test_jpeg_420_and_444_reject_each_other():
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    with pytest.raises(NotImplementedError):
        multimodal.decode_jpeg_color444(multimodal.encode_jpeg_color420(img))
    with pytest.raises(NotImplementedError):
        multimodal.decode_jpeg_color420(multimodal.encode_jpeg_color444(img))
    with pytest.raises(NotImplementedError):
        multimodal.decode_jpeg_color420(
            multimodal.encode_jpeg_gray8(np.zeros((8, 8), dtype=np.uint8))
        )


def test_jpeg_progressive_matches_baseline_pixels():
    """The cross-codec exactness contract: the progressive encoder uses
    the same FDCT/quantization as the baseline one, so decoding the SOF2
    stream must yield BIT-IDENTICAL pixels to the baseline pipeline over
    the same source — any error in the four-scan accumulation (DC/AC
    bands, successive-approximation refinement) breaks the equality."""
    rng = np.random.default_rng(11)
    cases = [
        rng.integers(0, 256, (24, 32), dtype=np.uint8),
        np.full((16, 16), 77, dtype=np.uint8),
        np.add.outer(np.arange(40), np.arange(56)).astype(np.uint8),
        np.array([[200]], dtype=np.uint8),          # 1x1
        rng.integers(0, 256, (7, 9), dtype=np.uint8),   # odd dims
        (rng.integers(0, 256, (32, 32))
         * (rng.random((32, 32)) < 0.05)).astype(np.uint8),  # sparse AC
        (128 + 100 * np.sin(
            np.add.outer(np.arange(48), np.arange(48)) / 9.0
        )).astype(np.uint8),                        # smooth → long EOB runs
    ]
    for img in cases:
        base = multimodal.decode_jpeg_gray8(multimodal.encode_jpeg_gray8(img))
        prog = multimodal.decode_jpeg_gray8(
            multimodal.encode_jpeg_gray8_progressive(img)
        )
        assert base[:2] == prog[:2]
        assert np.array_equal(base[2], prog[2]), img.shape


def test_jpeg_progressive_stream_is_really_sof2():
    """The payload must be genuine progressive JPEG: SOF2 marker, FOUR
    SOS scans (DC first, AC first, DC refine, AC refine), and the
    baseline-only branch must be unreachable for it."""
    img = np.add.outer(np.arange(24), np.arange(24)).astype(np.uint8)
    data = multimodal.encode_jpeg_gray8_progressive(img)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    # count SOS markers outside entropy data is fiddly; the scan headers
    # we emit are distinctive 8-byte segments
    import struct as _s
    n_sos, pos = 0, 2
    while pos + 4 <= len(data):
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = _s.unpack_from(">H", data, pos + 2)
        if marker == 0xDA:
            n_sos += 1
            # skip entropy data to the next marker
            i = pos + 2 + ln
            while True:
                i = data.index(b"\xff", i)
                if data[i + 1] == 0x00:
                    i += 2
                    continue
                break
            pos = i
            continue
        pos += 2 + ln
    assert n_sos == 4
    # and the q127-style constant-block fixture decodes exactly
    blocks = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    plane = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
    w, h, out = multimodal.decode_jpeg_gray8(
        multimodal.encode_jpeg_gray8_progressive(plane)
    )
    assert (w, h) == (32, 24)
    assert np.array_equal(out, plane)


def test_jpeg_progressive_refinement_carries_information():
    """Successive approximation is real, not a formality: decoding only
    the first two scans (truncate before the refinement scans) must give
    a DIFFERENT — coarser — image than the full stream for content with
    odd coefficients, while the full stream is exact vs baseline."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    data = multimodal.encode_jpeg_gray8_progressive(img)
    # locate the third SOS (DC refinement) and truncate there + EOI
    import struct as _s
    n_sos, pos = 0, 2
    while pos + 4 <= len(data):
        marker = data[pos + 1]
        (ln,) = _s.unpack_from(">H", data, pos + 2)
        if marker == 0xDA:
            n_sos += 1
            if n_sos == 3:
                truncated = data[:pos] + b"\xff\xd9"
                break
            i = pos + 2 + ln
            while True:
                i = data.index(b"\xff", i)
                if data[i + 1] == 0x00:
                    i += 2
                    continue
                break
            pos = i
            continue
        pos += 2 + ln
    full = multimodal.decode_jpeg_gray8(data)[2]
    coarse = multimodal.decode_jpeg_gray8_progressive(truncated)[2]
    assert not np.array_equal(full, coarse)
    base = multimodal.decode_jpeg_gray8(multimodal.encode_jpeg_gray8(img))[2]
    assert np.array_equal(full, base)


def test_image_dhash_matches_numpy_reference(spark, sf_dir):
    """image_dhash must equal a direct numpy replay over the decoded BMP
    plane: floor-index 9x8 resample, strict adjacent comparison, bit
    r*8+c packed into lo (r<4) / hi (r>=4)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 30
    )
    payloads = multimodal.attach_image_payload(docs, wh_mod=(4, 3))
    got = {r.doc: (r.sim_hi, r.sim_lo)
           for r in multimodal.image_dhash(payloads).collect()}
    for r in payloads.collect():
        w, h, plane = multimodal.decode_bmp_gray8(bytes(r.payload))
        grid = plane[np.arange(8) * h // 8][:, np.arange(9) * w // 9]
        lo = hi = 0
        for rr in range(8):
            for cc in range(8):
                if int(grid[rr, cc]) > int(grid[rr, cc + 1]):
                    if rr < 4:
                        lo |= 1 << (rr * 8 + cc)
                    else:
                        hi |= 1 << ((rr - 4) * 8 + cc)
        assert got[r.doc_id] == (hi, lo), r.doc_id
    # identical planes collide at Hamming 0 through the banded engine
    from hive_cassandra_spark.operators import dedup as dd

    dup = docs.limit(3).withColumn("doc_id", F.col("doc_id") + 3 * 4 * 1000)
    # +multiple of 12 keeps (w, h) identical for the copies
    both = multimodal.attach_image_payload(
        docs.unionAll(dup), wh_mod=(4, 3)
    )
    pairs = dd.signature_hamming_pairs(
        multimodal.image_dhash(both), max_hamming=0
    ).collect()
    copies = {(r.doc_a, r.doc_b) for r in pairs if r.doc_b - r.doc_a == 12000}
    assert len(copies) >= 3


def test_image_dhash_survives_jpeg_quality_shift(spark):
    """The r08-verdict item-7 recall gate: a perceptually-identical image
    re-encoded at a 4x coarser JPEG quantization table (the 'quality
    shift' of a real re-upload pipeline) must land within a few Hamming
    bits of the original encode — and the banded signature_hamming_pairs
    engine must FIND every (original, re-encode) pair, even though the
    byte payloads differ completely (which exact/byte-level dedup can
    never see)."""
    from hive_cassandra_spark.operators import dedup as dd
    from hive_cassandra_spark.operators.multimodal import (
        _JPEG_QTABLE,
        decode_jpeg_gray8,
        encode_jpeg_gray8,
    )

    # blocky high-contrast images aligned to the 9x8 dhash grid: cell
    # (r, c) is a constant 8x8 block with value ((r*9+c)*37 % 8)*32 —
    # deterministic, adjacent cells always differ by >=32, so the dhash
    # bits ride coarse structure that quantization noise cannot flip
    def img(seed):
        cells = (((np.arange(8)[:, None] * 9 + np.arange(9)[None, :]) * 37
                  + seed * 11) % 8) * 32
        blocky = np.kron(cells, np.ones((8, 8), dtype=np.int64))
        # mild intra-block texture (amplitude 7 << the 32-level cell
        # contrast): gives each block AC energy so the coarser table is
        # ACTUALLY lossy, without threatening the dhash grid comparisons
        h, w = blocky.shape
        texture = (np.arange(h)[:, None] % 8) + (np.arange(w)[None, :] % 8) // 2
        return np.clip(blocky + texture, 0, 255).astype(np.uint8)

    coarse_q = np.minimum(_JPEG_QTABLE * 4, 255)
    rows = []
    for seed in range(6):
        plane = img(seed)
        h, w = plane.shape
        for doc_id, buf in (
            (seed, encode_jpeg_gray8(plane)),
            (1000 + seed, encode_jpeg_gray8(plane, qtable=coarse_q)),
        ):
            rows.append((doc_id, bytearray(buf), ("image/jpeg", w, h, 1)))
        # the quality shift must actually change pixels somewhere across
        # the suite, or the test degenerates into the hamming-0 case
    df = spark.createDataFrame(
        rows,
        "doc_id long, payload binary, "
        "meta struct<format:string,width:int,height:int,n_frames:int>",
    )
    from hive_cassandra_spark.operators import multimodal as mm

    sig = {r.doc: (r.sim_hi, r.sim_lo)
           for r in mm.image_dhash(df).collect()}
    for seed in range(6):
        hi_a, lo_a = sig[seed]
        hi_b, lo_b = sig[1000 + seed]
        ham = bin((hi_a ^ hi_b)).count("1") + bin((lo_a ^ lo_b)).count("1")
        assert ham <= 6, (seed, ham)
    pairs = dd.signature_hamming_pairs(mm.image_dhash(df), max_hamming=6)
    found = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    for seed in range(6):
        assert (seed, 1000 + seed) in found, seed
    # sanity: the shift is a REAL re-encode (bytes and pixels differ for
    # at least some images), so this is not the identical-plane case
    diffs = 0
    for seed in range(6):
        a = decode_jpeg_gray8(encode_jpeg_gray8(img(seed)))[2]
        b = decode_jpeg_gray8(
            encode_jpeg_gray8(img(seed), qtable=coarse_q)
        )[2]
        diffs += int(not np.array_equal(a, b))
    assert diffs > 0


def test_mp4_container_roundtrip_metadata_and_samples():
    """encode_mp4_video → mp4_metadata_bytes / mp4_sample_table /
    mp4_extract_samples: every probed field equals the mux parameters
    and every sliced sample equals its source bytes — including empty
    samples and a >64KB sample (4-byte size paths)."""
    from hive_cassandra_spark.operators import multimodal as mm

    frames = [b"alpha", b"", b"x" * 70_000, b"tail"]
    data = mm.encode_mp4_video(frames, width=640, height=360,
                               timescale=600, sample_delta=25)
    meta = mm.mp4_metadata_bytes(data)
    assert meta == {
        "n_tracks": 1, "timescale": 600, "duration": 100,
        "width": 640, "height": 360, "handler": "vide", "codec": "mp4v",
        "n_samples": 4, "sample_bytes": 5 + 0 + 70_000 + 4,
        "max_sample_bytes": 70_000,
    }
    assert mm.mp4_extract_samples(data, [0, 1, 2, 3]) == frames
    assert mm.mp4_extract_samples(data, [3, 0]) == [b"tail", b"alpha"]


def test_mp4_sample_table_multi_chunk_stsc():
    """The sample-table resolution is GENERAL (stsc runs x stco
    offsets), not just this muxer's one-chunk layout: a hand-built
    two-run stsc (chunk 1 holds 2 samples, chunks 2-3 hold 1 each)
    must resolve every sample's absolute offset."""
    import struct

    from hive_cassandra_spark.operators import multimodal as mm

    sizes = [3, 4, 5, 6]
    mdat_payload = b"aaabbbbcccccdddddd"
    full = lambda t, p: mm._mp4_full(t, 0, 0, p)  # noqa: E731
    stsd = full(b"stsd", struct.pack(">I", 1) + mm._mp4_box(b"mp4v", b"\x00" * 78))
    stsz = full(
        b"stsz",
        struct.pack(">II", 0, 4)
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stsc = full(
        b"stsc",
        struct.pack(">I", 2)
        + struct.pack(">III", 1, 2, 1)   # chunk 1: 2 samples
        + struct.pack(">III", 2, 1, 1),  # chunks 2..: 1 sample each
    )

    def build(offsets):
        stco = full(
            b"stco",
            struct.pack(">I", len(offsets))
            + b"".join(struct.pack(">I", o) for o in offsets),
        )
        stbl = mm._mp4_box(b"stbl", stsd + stsz + stsc + stco)
        minf = mm._mp4_box(b"minf", stbl)
        mdia = mm._mp4_box(b"mdia", minf)
        trak = mm._mp4_box(b"trak", mdia)
        moov = mm._mp4_box(b"moov", trak)
        return moov

    moov_len = len(build([0, 0, 0]))
    base = moov_len + 8  # mdat payload offset
    # chunk 1 at base (samples 0,1), chunk 2 at base+7 (sample 2),
    # chunk 3 at base+12 (sample 3)
    data = build([base, base + 7, base + 12]) + mm._mp4_box(b"mdat", mdat_payload)
    assert mm.mp4_sample_table(data) == [
        (base, 3), (base + 3, 4), (base + 7, 5), (base + 12, 6),
    ]
    assert mm.mp4_extract_samples(data, [0, 1, 2, 3]) == [
        b"aaa", b"bbbb", b"ccccc", b"dddddd",
    ]


def test_mp4_guards_fail_closed():
    """Truncated boxes, missing moov, and v1 (64-bit) tables raise
    instead of mis-parsing."""
    import struct

    import pytest as _pytest

    from hive_cassandra_spark.operators import multimodal as mm

    data = mm.encode_mp4_video([b"x"], 1, 1)
    with _pytest.raises(ValueError):
        mm.mp4_metadata_bytes(b"\x00\x00\x00\x10free" + b"\x00" * 8)
    with _pytest.raises(ValueError):
        list(mm.mp4_boxes(data[:5]))
    # flip mvhd to version 1: find it and bump the version byte
    i = data.index(b"mvhd")
    v1 = data[: i + 4] + b"\x01" + data[i + 5 :]
    with _pytest.raises(NotImplementedError):
        mm.mp4_metadata_bytes(v1)


def test_mp4_frame_sample_slices_real_samples(spark, sf_dir):
    """frame_sample's video/mp4 branch slices ENCODED samples straight
    out of mdat via the sample table — recovered bytes equal the strided
    source frames the fixture muxed."""
    from pyspark.sql import functions as F2

    from hive_cassandra_spark.operators import multimodal as mm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F2.col("doc_id") < 20
    )
    vids = mm.attach_mp4_payload(docs).withColumn(
        "meta",
        F2.create_map(F2.lit("format"), F2.lit("video/mp4")),
    )
    out = mm.frame_sample(vids, n_frames=2, fake=False)
    got = {
        (r.doc_id, r.frame_idx): bytes(r.frame) for r in out.collect()
    }
    for r in docs.select("doc_id", "text").collect():
        raw = r.text.encode("utf-8")
        n = r.doc_id % 3 + 2
        src_frames = [raw[k::n] for k in range(n)]
        for i in range(2):
            assert got[(r.doc_id, i)] == src_frames[i * n // 2], (r.doc_id, i)


def test_mjpeg_mp4_end_to_end_pixel_identical(spark, sf_dir):
    """r10 verdict item 4: frames decoded OUT of a muxed MJPEG MP4 must
    be pixel-identical to the source planes — container demux (stsc x
    stco x stsz) and codec decode (T.81 Huffman/DCT) composing with
    zero media libraries. Constant-block planes make the lossy codec
    exact (the q127 argument)."""
    import numpy as np

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(12)
    vids = multimodal.attach_mjpeg_mp4_payload(docs)
    # n_frames == max total (4) so every stored frame is sampled at
    # least once; picks i*total//4 for total in (2..4) stay in range
    frames = {
        (r.doc_id, r.frame_idx): bytes(r.frame)
        for r in multimodal.frame_sample(vids, n_frames=4, fake=False)
        .collect()
    }
    for r in docs.select("doc_id", "text").collect():
        bw, bh = r.doc_id % 8 + 2, r.doc_id % 6 + 2
        total = r.doc_id % 3 + 2
        raw = r.text.encode("utf-8")
        for i in range(4):
            src = i * total // 4
            sl = raw[src * bw * bh : (src + 1) * bw * bh].ljust(
                bw * bh, b"\x00"
            )
            blocks = np.frombuffer(sl, dtype=np.uint8).reshape(bh, bw)
            want = np.repeat(np.repeat(blocks, 8, 0), 8, 1).tobytes()
            assert frames[(r.doc_id, i)] == want, (r.doc_id, i)
    # non-jpeg codecs still yield ENCODED samples (decode is ffmpeg's)
    plain = multimodal.attach_mp4_payload(docs.limit(2))
    with_meta = plain.withColumn(
        "meta",
        F.struct(
            F.lit("video/mp4").alias("format"),
            F.lit(1).alias("width"),
            F.lit(1).alias("height"),
            F.lit(2).alias("n_frames"),
        ),
    )
    out = multimodal.frame_sample(with_meta, n_frames=2, fake=False).collect()
    assert len(out) == 4 and all(len(bytes(r.frame)) > 0 for r in out)


def test_frame_pixel_stats_matches_numpy(spark):
    """frame_pixel_stats integer stats == numpy ground truth, empty
    frames survive with zeros."""
    df = spark.createDataFrame(
        [(1, 0, bytes([0, 1, 2, 255])), (1, 1, b""), (2, 0, bytes([7]))],
        "doc_id long, frame_idx int, frame binary",
    )
    out = {
        (r.doc_id, r.frame_idx): (r.n_px, r.sum_px, r.min_px, r.max_px)
        for r in multimodal.frame_pixel_stats(df).collect()
    }
    assert out == {
        (1, 0): (4, 258, 0, 255),
        (1, 1): (0, 0, 0, 0),
        (2, 0): (1, 7, 7, 7),
    }


def test_mp4_audio_first_track_selection_consistent():
    """Codec decision and sample source must come from the SAME track:
    an MP4 whose FIRST stbl-bearing track is audio ('soun') followed by
    a video track with jpeg samples must probe codec='jpeg', slice the
    VIDEO track's samples, and frame_sample must decode them — not feed
    audio bytes to the JPEG decoder."""
    import struct

    import numpy as np

    from hive_cassandra_spark.operators import multimodal as mm

    plane = np.full((8, 8), 7, dtype=np.uint8)
    jpeg = mm.encode_jpeg_gray8(plane)
    audio = b"\x01\x02\x03\x04"
    full = lambda t, p: mm._mp4_full(t, 0, 0, p)  # noqa: E731

    def trak(handler, codec, sample_len, offset):
        stsd = full(
            b"stsd", struct.pack(">I", 1) + mm._mp4_box(codec, b"\x00" * 78)
        )
        stsz = full(
            b"stsz", struct.pack(">II", 0, 1) + struct.pack(">I", sample_len)
        )
        stsc = full(b"stsc", struct.pack(">I", 1) + struct.pack(">III", 1, 1, 1))
        stco = full(b"stco", struct.pack(">I", 1) + struct.pack(">I", offset))
        stbl = mm._mp4_box(b"stbl", stsd + stsz + stsc + stco)
        minf = mm._mp4_box(b"minf", stbl)
        hdlr = full(
            b"hdlr", struct.pack(">I", 0) + handler + b"\x00" * 12 + b"h\x00"
        )
        mdia = mm._mp4_box(b"mdia", hdlr + minf)
        return mm._mp4_box(b"trak", mdia)

    def build(audio_off, video_off):
        moov = mm._mp4_box(
            b"moov",
            trak(b"soun", b"mp4a", len(audio), audio_off)
            + trak(b"vide", b"jpeg", len(jpeg), video_off),
        )
        return moov

    base = len(build(0, 0)) + 8
    data = build(base, base + len(audio)) + mm._mp4_box(b"mdat", audio + jpeg)
    # sample-level readers pick the VIDEO track
    assert mm.mp4_sample_codec(data) == "jpeg"
    assert mm.mp4_sample_table(data) == [(base + len(audio), len(jpeg))]
    assert mm.mp4_extract_samples(data, [0]) == [jpeg]
    # metadata probe agrees (vide-preferred since round 11)
    meta = mm.mp4_metadata_bytes(data)
    assert meta["codec"] == "jpeg" and meta["n_tracks"] == 2
    # the decode routing composes: the sliced sample IS a decodable JPEG
    w, h, px = mm.decode_jpeg_gray8(mm.mp4_extract_samples(data, [0])[0])
    assert (w, h) == (8, 8) and np.array_equal(px, plane)


def _fp_replay(samples: np.ndarray) -> tuple[int, int]:
    """Direct numpy replay of the audio_fingerprint arithmetic: frame
    i*65 div n, energy = int64 sum of |sample|, bit k = strict
    energy[k+1] > energy[k], bits 0-31 -> lo / 32-63 -> hi."""
    n = int(samples.size)
    frames = np.arange(n) * 65 // n if n else np.array([], dtype=np.int64)
    energy = np.zeros(65, dtype=np.int64)
    np.add.at(energy, frames, np.abs(samples.astype(np.int64)))
    bits = (energy[1:] > energy[:-1]).astype(np.uint64)
    w32 = 1 << np.arange(32, dtype=np.uint64)
    return int((bits[32:] * w32).sum()), int((bits[:32] * w32).sum())


def test_audio_fingerprint_matches_replay_and_survives_ulaw(spark, sf_dir):
    """audio_fingerprint: (1) the kernel's signature equals a direct
    numpy replay of the documented arithmetic over the decoded samples
    (both codecs); (2) the same clip recompressed through lossy G.711
    lands within a few Hamming bits of its PCM fingerprint — the
    cross-codec robustness that makes it a dedup signal where byte-level
    dedup sees nothing."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(8)
    texts = {r.doc_id: r.text for r in docs.collect()}
    pcm_sig = {
        r.doc: (r.sim_hi, r.sim_lo)
        for r in multimodal.audio_fingerprint(
            multimodal.attach_audio_payload(docs, container="pcm")
        ).collect()
    }
    ulaw_sig = {
        r.doc: (r.sim_hi, r.sim_lo)
        for r in multimodal.audio_fingerprint(
            multimodal.attach_audio_payload(docs, container="ulaw")
        ).collect()
    }
    assert set(pcm_sig) == set(texts) == set(ulaw_sig)
    for doc_id, text in texts.items():
        raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        x = (raw.astype(np.int16) - 128) << 8
        assert pcm_sig[doc_id] == _fp_replay(x)
        xq = multimodal.decode_ulaw(multimodal.encode_ulaw(x))
        assert ulaw_sig[doc_id] == _fp_replay(xq)
        ham = bin(pcm_sig[doc_id][0] ^ ulaw_sig[doc_id][0]).count("1") + bin(
            pcm_sig[doc_id][1] ^ ulaw_sig[doc_id][1]
        ).count("1")
        assert ham <= 6, (doc_id, ham)
        # non-negative 32-bit halves: the house signature layout
        assert 0 <= pcm_sig[doc_id][0] < 1 << 32
        assert 0 <= pcm_sig[doc_id][1] < 1 << 32


def test_audio_fingerprint_short_clip_and_banded_pairs(spark):
    """Clips shorter than 65 samples leave trailing frames at energy 0
    (no crash, deterministic bits), and exact-duplicate audio routes
    through the banded-Hamming engine as Hamming-0 pairs."""
    from hive_cassandra_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "hi"), (2, "hi"), (3, "a completely different longer text")],
        "doc_id long, text string",
    )
    sig = multimodal.audio_fingerprint(
        multimodal.attach_audio_payload(docs, container="pcm")
    )
    rows = {r.doc: (r.sim_hi, r.sim_lo) for r in sig.collect()}
    assert rows[1] == rows[2]
    raw = np.frombuffer(b"hi", dtype=np.uint8)
    assert rows[1] == _fp_replay((raw.astype(np.int16) - 128) << 8)
    pairs = dedup.signature_hamming_pairs(sig, max_hamming=3).collect()
    assert {(r.doc_a, r.doc_b, r.hamming) for r in pairs} >= {(1, 2, 0)}


def _video_fp_replay(text: str) -> tuple[int, int]:
    """Direct replay of the documented video-fingerprint arithmetic
    from the timeline fixture's text bytes: frame k is a constant 8x8
    block of byte k (zero-padded to 65), slot energy = 64*byte, bit k
    = strict energy[k+1] > energy[k]."""
    raw = text.encode("utf-8")[:65].ljust(65, b"\x00")
    bits = [1 if raw[k + 1] > raw[k] else 0 for k in range(64)]
    lo = sum(b << k for k, b in enumerate(bits[:32]))
    hi = sum(b << k for k, b in enumerate(bits[32:]))
    return hi, lo


def test_video_fingerprint_matches_replay_and_rate_invariance(
    spark, sf_dir
):
    """video_fingerprint: (1) the kernel's signature — through the REAL
    mux, demux, and T.81 decode — equals a direct replay of the
    documented arithmetic from the text bytes; (2) the same clip
    re-muxed at 2x frame rate (different sample count, stts delta,
    stsz table, mdat — byte-level dedup sees nothing) lands at Hamming
    0: the time-normalized slot grid picks the same time instants at
    either rate."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(8)
    texts = {r.doc_id: r.text for r in docs.collect()}
    sig1 = {
        r.doc: (r.sim_hi, r.sim_lo)
        for r in multimodal.video_fingerprint(
            multimodal.attach_mjpeg_timeline_payload(docs, fps_mult=1)
        ).collect()
    }
    sig2 = {
        r.doc: (r.sim_hi, r.sim_lo)
        for r in multimodal.video_fingerprint(
            multimodal.attach_mjpeg_timeline_payload(docs, fps_mult=2)
        ).collect()
    }
    assert set(sig1) == set(texts) == set(sig2)
    for doc_id, text in texts.items():
        assert sig1[doc_id] == _video_fp_replay(text)
        assert sig2[doc_id] == sig1[doc_id]  # frame-rate invariance
        assert 0 <= sig1[doc_id][0] < 1 << 32
        assert 0 <= sig1[doc_id][1] < 1 << 32
    # the two muxes genuinely differ at the byte level
    p1 = multimodal.attach_mjpeg_timeline_payload(docs, fps_mult=1)
    p2 = multimodal.attach_mjpeg_timeline_payload(docs, fps_mult=2)
    l1 = {r.doc_id: len(bytes(r.payload)) for r in p1.collect()}
    l2 = {r.doc_id: len(bytes(r.payload)) for r in p2.collect()}
    for doc_id in texts:
        assert l2[doc_id] > l1[doc_id]


def test_video_fingerprint_short_text_guards_and_pairs(spark):
    """Texts shorter than 65 bytes zero-pad (trailing slots at energy
    0), wrong-codec payloads fail closed, and exact-duplicate
    timelines route through the banded-Hamming engine as Hamming-0
    pairs."""
    import pytest

    from hive_cassandra_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "hi"), (2, "hi"), (3, "a completely different longer text")],
        "doc_id long, text string",
    )
    sig = multimodal.video_fingerprint(
        multimodal.attach_mjpeg_timeline_payload(docs, fps_mult=1)
    )
    rows = {r.doc: (r.sim_hi, r.sim_lo) for r in sig.collect()}
    assert rows[1] == rows[2] == _video_fp_replay("hi")
    pairs = dedup.signature_hamming_pairs(sig, max_hamming=3).collect()
    assert {(r.doc_a, r.doc_b, r.hamming) for r in pairs} >= {(1, 2, 0)}
    # non-jpeg codec fails closed (external decoder fleet boundary)
    frames = [b"\x00" * 10]
    payload = multimodal.encode_mp4_video(
        frames, width=8, height=8, codec=b"avc1"
    )
    bad = spark.createDataFrame(
        [(9, payload, {"format": "video/mp4"})],
        multimodal.attach_mjpeg_timeline_payload(docs).schema,
    )
    with pytest.raises(Exception, match="external decoder|avc1"):
        multimodal.video_fingerprint(bad).collect()


def test_video_scene_stats_cut_rule_and_segmentation(spark):
    """The integer cut rule (|e2-e1|*4 > max(e2,e1)) and the
    running-sum scene segmentation, pinned on hand-built slot
    energies: flat runs never cut, >25% relative jumps do, scene
    lengths and the longest-scene rollup match the hand trace."""
    rows = []
    # doc 1: 100,100,100,200,200,90,90 -> cuts at 100->200 and
    # 200->90 -> 3 scenes of lengths 3,2,2
    for k, e in enumerate([100, 100, 100, 200, 200, 90, 90]):
        rows.append((1, k, e))
    # doc 2: all zeros (short text padding) -> no cuts, one scene
    for k in range(5):
        rows.append((2, k, 0))
    # doc 3: exact-boundary jump 120->160 (40*4 == 160, NOT >) stays
    # one scene; 160->100 (60*4 = 240 > 160) cuts
    for k, e in enumerate([120, 160, 100]):
        rows.append((3, k, e))
    se = spark.createDataFrame(rows, "doc long, slot int, energy long")
    out = {
        r.doc: r.asDict()
        for r in multimodal.video_scene_stats(se).collect()
    }
    assert out[1]["n_cuts"] == 2 and out[1]["n_scenes"] == 3
    assert out[1]["longest_scene_slots"] == 3
    assert out[2]["n_cuts"] == 0 and out[2]["longest_scene_slots"] == 5
    # boundary 120->160 is NOT a cut (strict >); 160->100 is
    assert out[3]["n_cuts"] == 1 and out[3]["n_scenes"] == 2
    assert out[3]["longest_scene_slots"] == 2
    assert out[1]["mean_energy"] == (100 * 3 + 200 * 2 + 90 * 2) // 7


def test_video_slot_energies_match_text_replay(spark):
    """End-to-end: slot energies through the REAL mux/demux/decode
    equal 64*byte of the timeline fixture's text bytes."""
    docs = spark.createDataFrame(
        [(7, "scene one....SCENE TWO!!!"), (8, "x")],
        "doc_id long, text string",
    )
    vids = multimodal.attach_mjpeg_timeline_payload(docs, fps_mult=1)
    got = {
        (r.doc, r.slot): r.energy
        for r in multimodal.video_slot_energies(vids).collect()
    }
    for doc_id, text in [(7, "scene one....SCENE TWO!!!"), (8, "x")]:
        raw = text.encode()[:65].ljust(65, b"\x00")
        for k in range(65):
            assert got[(doc_id, k)] == 64 * raw[k], (doc_id, k)
