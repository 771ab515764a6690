"""Multimodal container synthesis + parsing unit tests (the de-stubbed
metadata decode path) and the Spark plumbing around it."""

import pytest

from table_streaming_source_spark.operators.multimodal import (
    attach_container_payload,
    decode_media,
    parse_container,
    synth_avi,
    synth_png,
    synth_wav,
)


def test_png_round_trip():
    payload = synth_png(640, 480)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    assert parse_container(payload) == ("image", 640, 480, 1)


def test_wav_round_trip():
    payload = synth_wav(1234, channels=2, sample_rate=44100)
    assert len(payload) == 44 + 1234 * 4
    assert parse_container(payload) == ("audio", -1, -1, 1234)


def test_avi_round_trip():
    payload = synth_avi(320, 240, 42)
    assert len(payload) == 88
    assert parse_container(payload) == ("video", 320, 240, 42)


def test_parse_rejects_unknown_and_truncated():
    with pytest.raises(ValueError, match="Unknown container"):
        parse_container(b"not a container at all")
    with pytest.raises(ValueError):
        parse_container(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4)  # no IHDR
    with pytest.raises(ValueError, match="fmt/data"):
        parse_container(b"RIFF\x04\x00\x00\x00WAVE")  # chunkless WAVE


def test_wav_parser_honors_odd_chunk_padding():
    # RIFF chunks are word-aligned: an odd-sized unknown chunk before
    # fmt/data must not desync the walk
    import struct

    odd = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    wav = synth_wav(10)
    payload = wav[:12] + odd + wav[12:]
    assert parse_container(payload) == ("audio", -1, -1, 10)


def test_decode_media_parse_path_on_spark(spark, sf_dir):
    from table_streaming_source_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").limit(30)
    media = attach_container_payload(docs, "doc_id")
    out = decode_media(media, key="key", decoder="parse").collect()
    assert len(out) == 30
    for r in out:
        k = r.key
        if k % 3 == 0:
            assert (r.media_type, r.width, r.height, r.n_frames, r.n_bytes) == (
                "image", 64 + (k * 7) % 192, 64 + (k * 13) % 192, 1, 57
            )
        elif k % 3 == 1:
            ns, ch = 100 + k % 400, 1 + k % 2
            assert (r.media_type, r.width, r.height, r.n_frames, r.n_bytes) == (
                "audio", -1, -1, ns, 44 + ns * ch * 2
            )
        else:
            assert (r.media_type, r.width, r.height, r.n_frames, r.n_bytes) == (
                "video", 64 + (k * 11) % 192, 64 + (k * 17) % 192, 1 + k % 16, 88
            )


def test_decoder_real_still_raises_for_pixel_decode(spark, sf_dir):
    from table_streaming_source_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").limit(1)
    media = attach_container_payload(docs, "doc_id")
    with pytest.raises(NotImplementedError, match="parse"):
        decode_media(media, key="key", decoder="real")


def test_wav_pcm_roundtrip_and_features(spark):
    """synth_wav_tone → wav_pcm must round-trip the formula samples, and
    audio_features must match a direct numpy computation."""
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        attach_tone_payload,
        audio_features,
        synth_wav_tone,
        wav_pcm,
    )

    s = wav_pcm(synth_wav_tone(300, seed=11))
    i = np.arange(300, dtype=np.int64)
    expect = ((i * (3 + 11 % 7) + 11) % 4096) - 2048
    assert (s == expect).all()

    df = spark.createDataFrame([(11,), (42,)], "doc_id long")
    feats = audio_features(
        attach_tone_payload(df, "doc_id"), window=128
    ).collect()
    for r in feats:
        k = r.key
        n_samples = 100 + k % 400
        j = np.arange(n_samples, dtype=np.int64)
        sig = ((j * (3 + k % 7) + k) % 4096) - 2048
        seg = sig[r.w * 128 : (r.w + 1) * 128]
        assert r.n == len(seg)
        assert r.sum_sq == int((seg * seg).sum())
        assert r.crossings == int(((seg[:-1] * seg[1:]) < 0).sum())


def test_png_pixel_decode_roundtrip(spark):
    """synth_png_pixels → png_pixels must round-trip the formula, and
    image_pixel_stats must match direct numpy computation."""
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        attach_pixel_payload,
        image_pixel_stats,
        png_pixels,
        synth_png_pixels,
    )

    px = png_pixels(synth_png_pixels(20, 10, seed=5))
    assert px.shape == (10, 20)
    x = np.arange(20)[None, :]; y = np.arange(10)[:, None]
    assert (px == ((7 * x + 13 * y + 5) % 256)).all()

    df = spark.createDataFrame([(5,), (12,)], "doc_id long")
    stats = {
        r.key: r
        for r in image_pixel_stats(attach_pixel_payload(df, "doc_id")).collect()
    }
    for k, r in stats.items():
        w, h = 16 + (7 * k) % 48, 16 + (13 * k) % 48
        xx = np.arange(w)[None, :]; yy = np.arange(h)[:, None]
        p = ((7 * xx + 13 * yy + k) % 256).astype(np.int64)
        assert (r.width, r.height) == (w, h)
        assert r.sum_px == int(p.sum())
        assert r.edge_energy == int(np.abs(np.diff(p, axis=1)).sum())


def test_gif_lzw_round_trip_and_spec_anchor():
    """The LZW encoder/decoder pair must round-trip data that forces
    code-width growth and ≥1 full-table (4096) CLEAR reset, and the
    decoder must read a known in-the-wild GIF (CLEAR handling, missing
    EOI tolerated) — anchoring it to the public spec, not merely to the
    sibling encoder."""
    import base64
    import random

    from table_streaming_source_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
        gif_pixels,
    )

    rng = random.Random(7)
    for n in (1, 300, 5000, 40000):  # 40k random bytes ⇒ table resets
        data = bytes(rng.randrange(256) for _ in range(n))
        assert _lzw_decode(_lzw_encode(data, 8), 8) == data
    runs = bytes([i // 100 % 4 for i in range(30000)])  # KwKwK chains
    assert _lzw_decode(_lzw_encode(runs, 2), 2) == runs

    tiny = base64.b64decode(  # the classic 1×1 black GIF
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    px = gif_pixels(tiny)
    assert px.shape == (1, 1) and px[0, 0] == 0


def test_gif_pixel_decode_roundtrip(spark):
    """synth_gif_pixels → gif_pixels must round-trip the formula;
    image_pixel_stats must dispatch GIF and PNG payloads alike; broken
    frames raise ValueError (the quarantine contract)."""
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        attach_gif_payload,
        attach_pixel_payload,
        gif_pixels,
        image_pixel_stats,
        parse_container,
        synth_gif_pixels,
    )

    px = gif_pixels(synth_gif_pixels(20, 10, seed=5))
    assert px.shape == (10, 20)
    x = np.arange(20)[None, :]; y = np.arange(10)[:, None]
    assert (px == ((7 * x + 13 * y + 5) % 256)).all()
    assert parse_container(synth_gif_pixels(20, 10, 5)) == (
        "image", 20, 10, 1,
    )

    df = spark.createDataFrame([(5,), (12,)], "doc_id long")
    gif_stats = {
        r.key: r
        for r in image_pixel_stats(attach_gif_payload(df, "doc_id")).collect()
    }
    png_stats = {
        r.key: r
        for r in image_pixel_stats(
            attach_pixel_payload(df, "doc_id")
        ).collect()
    }
    # same formula, two codecs: stats must agree exactly
    for k in (5, 12):
        assert gif_stats[k] == png_stats[k]

    for bad in (
        synth_gif_pixels(8, 8, 0)[:20],  # truncated
        b"GIF89a\x00",  # no screen descriptor
    ):
        with pytest.raises(ValueError):
            gif_pixels(bad)


def test_gif_animation_frames_decode(spark):
    """Multi-frame GIF: gif_frames must decode every frame to its
    formula, and gif_frame_stats must sample every stride-th frame."""
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        attach_gif_animation_payload,
        gif_frame_stats,
        gif_frames,
        parse_container,
        synth_gif_animation,
    )

    payload = synth_gif_animation(12, 9, 4, seed=3)
    frames = gif_frames(payload)
    assert len(frames) == 4
    x = np.arange(12)[None, :]; y = np.arange(9)[:, None]
    for f, px in enumerate(frames):
        assert (px == ((7 * x + 13 * y + 17 * f + 3) % 256)).all()
    assert parse_container(payload) == ("image", 12, 9, 4)

    df = spark.createDataFrame([(2,), (5,)], "doc_id long")
    rows = gif_frame_stats(
        attach_gif_animation_payload(df, "doc_id"), stride=2
    ).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.key, []).append(r.frame)
    # n_frames = 2 + k % 4 → k=2: 4 frames → sampled {0, 2}; k=5: 3 → {0, 2}
    assert sorted(by_key[2]) == [0, 2]
    assert sorted(by_key[5]) == [0, 2]


def test_jpeg_synth_decode_is_bit_exact():
    """Block-constant synthesis + DC quant step 8 → the lossy codec
    round-trips exactly; the decoder earns the pixels through huffman +
    dequant + IDCT."""
    import numpy as np

    from table_streaming_source_spark.operators import multimodal as M

    for seed in (0, 5, 123, 250):
        w = 8 * (2 + (7 * seed) % 6)
        h = 8 * (2 + (13 * seed) % 6)
        px = M.jpeg_pixels(M.synth_jpeg_blocks(w, h, seed))
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        want = ((7 * (x // 8) + 13 * (y // 8) + seed) % 256).astype(np.uint8)
        assert px.shape == (h, w)
        assert (px == want).all()


def test_jpeg_coefficient_roundtrip_with_ac():
    """The coefficient-domain encoder is lossless, so the decoder must
    reproduce an independent dequant+IDCT+clamp pipeline bit-exactly —
    proving huffman run/size codes, zigzag, ZRL/EOB, and the IDCT on
    dense AC spectra, not just flat DC blocks."""
    import numpy as np

    from table_streaming_source_spark.operators import multimodal as M

    rng = np.random.RandomState(7)
    qt = np.full(64, 16, dtype=np.int64)
    qt[0] = 10
    w, h = 32, 24
    nb = (w // 8) * (h // 8)
    blocks = []
    for _ in range(nb):
        blk = np.zeros(64, dtype=np.int64)
        blk[0] = rng.randint(-120, 121)
        idx = rng.choice(np.arange(1, 64), size=12, replace=False)
        blk[idx] = rng.randint(-40, 41, size=12)
        blocks.append(blk)

    for dri in (0, 3):
        payload = M.encode_jpeg_gray_coeffs(
            blocks, w, h, qt.tolist(), restart_interval=dri
        )
        got = M.jpeg_pixels(payload)
        u = np.arange(8)[:, None]
        xx = np.arange(8)[None, :]
        a = 0.5 * np.cos((2 * xx + 1) * u * np.pi / 16.0)
        a[0] /= np.sqrt(2)
        ref = np.zeros((h, w))
        for m, blk in enumerate(blocks):
            by, bx = divmod(m, w // 8)
            s = (blk * qt).reshape(8, 8).astype(float)
            ref[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = a.T @ s @ a
        ref = np.clip(np.round(ref + 128), 0, 255).astype(np.uint8)
        assert (got == ref).all(), f"dri={dri}"


def test_jpeg_progressive_unsupported_shapes_quarantine():
    """A baseline body relabeled SOF2 is INVALID progressive (a
    progressive scan must be DC-only or AC-only, never Ss=0..Se=63) and
    must raise; AC successive-approximation refinement scans are the
    documented unsupported remainder and must raise too."""
    import struct

    import pytest

    from table_streaming_source_spark.operators import multimodal as M

    payload = M.synth_jpeg_blocks(16, 16, 1)
    prog = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="DC and AC"):
        M.jpeg_pixels(prog)
    # container metadata still parses geometry from any SOFn
    assert M.parse_container(prog) == ("image", 16, 16, 1)
    # truncated garbage JPEG raises in both paths
    with pytest.raises(ValueError):
        M.parse_container(b"\xff\xd8\xff\xfe\x00\x04ab")
    # AC refinement (Ah > 0) quarantines with an explicit message
    good = bytearray(M.synth_jpeg_progressive(16, 16, 1))
    # first AC scan header: FF DA len=8, ns=1 cid=1 tabs=0x01 Ss=1 Se=5 a=0
    i = good.find(b"\xff\xda\x00\x08\x01\x01\x01\x01\x05\x00")
    assert i > 0
    good[i + 9] = 0x10  # Ah=1, Al=0 → refinement
    with pytest.raises(ValueError, match="refinement"):
        M.jpeg_pixels(bytes(good))


def test_jpeg_progressive_decodes_bit_exactly():
    """Progressive (SOF2) decode equals the baseline decode of the SAME
    coefficient blocks — DC reassembled across two successive-
    approximation scans, AC drained through EOBn runs — for random
    sparse spectra and for a long all-EOB chain."""
    import numpy as np

    from table_streaming_source_spark.operators import multimodal as M

    rng = np.random.RandomState(11)
    q = [8] + [16] * 63
    for _ in range(4):
        bw, bh = rng.randint(1, 5), rng.randint(1, 5)
        w, h = bw * 8, bh * 8
        blocks = []
        for _ in range(bw * bh):
            blk = np.zeros(64, dtype=np.int64)
            blk[0] = rng.randint(-200, 200)
            if rng.rand() > 0.4:
                for _ in range(rng.randint(1, 8)):
                    blk[rng.randint(1, 64)] = rng.randint(-80, 80)
            blocks.append(blk.tolist())
        base = M.encode_jpeg_gray_coeffs(blocks, w, h, q)
        prog = M.encode_jpeg_gray_progressive(blocks, w, h, q)
        assert (M.jpeg_planes(base)[0] == M.jpeg_planes(prog)[0]).all()
        assert M.parse_container(prog) == ("image", w, h, 1)
    # 64 DC-only blocks: both AC scans are one EOBn chain (run > 32)
    blocks = [[v, *([0] * 63)] for v in range(-30, 34)]
    base = M.encode_jpeg_gray_coeffs(blocks, 64, 64, q)
    prog = M.encode_jpeg_gray_progressive(blocks, 64, 64, q)
    assert (M.jpeg_planes(base)[0] == M.jpeg_planes(prog)[0]).all()


def test_jpeg_container_parse_geometry():
    from table_streaming_source_spark.operators import multimodal as M

    payload = M.synth_jpeg_blocks(40, 24, 9)
    assert M.parse_container(payload) == ("image", 40, 24, 1)
    assert M.decode_pixels(payload).shape == (24, 40)


def test_jpeg_color_444_decode():
    """3-component 4:4:4 baseline JPEG → RGB: hand-assemble an
    interleaved-MCU color JPEG from the module's own huffman/bit-writer
    primitives (flat DC-only planes, DC quant step 8 → exact YCbCr),
    then check the decoder's YCbCr→RGB against the same T.81 formula."""
    import struct

    import numpy as np

    from table_streaming_source_spark.operators import multimodal as M

    w = h = 16
    y_v, cb_v, cr_v = 120, 90, 180

    def seg(marker, body):
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    qzz = bytes(
        M._JPEG_SYNTH_QTABLE[M._JPEG_ZIGZAG[i]] for i in range(64)
    )
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + qzz)
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes((1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0)),
    )
    out += seg(0xC4, b"\x00" + bytes(M._JPEG_DC_BITS) + bytes(M._JPEG_DC_VALS))
    out += seg(0xC4, b"\x10" + bytes(M._JPEG_AC_BITS) + bytes(M._JPEG_AC_VALS))
    out += seg(0xDA, bytes((3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0)))

    dc_enc = M._huff_encode_table(M._JPEG_DC_BITS, M._JPEG_DC_VALS)
    ac_enc = M._huff_encode_table(M._JPEG_AC_BITS, M._JPEG_AC_VALS)
    bw = M._JpegBitWriter()
    prev = [0, 0, 0]
    for _mcu in range(4):  # 16x16 → 2x2 MCUs of one block per component
        for ci, v in enumerate((y_v, cb_v, cr_v)):
            dc = v - 128
            t, mag = M._mag_bits(dc - prev[ci])
            prev[ci] = dc
            code, length = dc_enc[t]
            bw.write(code, length)
            bw.write(mag, t)
            code, length = ac_enc[0x00]
            bw.write(code, length)
    bw.flush()
    out += bw.out + b"\xff\xd9"

    rgb = M.jpeg_pixels(bytes(out))
    assert rgb.shape == (h, w, 3)
    want = np.clip(
        np.round(
            np.array(
                [
                    y_v + 1.402 * (cr_v - 128.0),
                    y_v
                    - 0.344136 * (cb_v - 128.0)
                    - 0.714136 * (cr_v - 128.0),
                    y_v + 1.772 * (cb_v - 128.0),
                ]
            )
        ),
        0,
        255,
    ).astype(np.uint8)
    assert (rgb == want[None, None, :]).all()
    # container metadata reads color geometry too
    assert M.parse_container(bytes(out)) == ("image", 16, 16, 1)


def test_avi_video_synth_decode_roundtrip():
    """The uncompressed-DIB AVI decoder recovers the exact synthesis
    formula for every frame — proving the bottom-up flip, BGR swap, and
    4-byte row stride are all honored (w=9 → 27-byte rows padded to 28,
    so a stride bug cannot cancel out)."""
    import numpy as np

    from table_streaming_source_spark.operators import multimodal as M

    for seed, w, h, nf in ((3, 9, 7, 3), (8, 8, 8, 1), (13, 15, 11, 4)):
        payload = M.synth_avi_video(w, h, nf, seed)
        frames = M.avi_frames(payload)
        assert len(frames) == nf
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        for f, rgb in enumerate(frames):
            assert rgb.shape == (h, w, 3)
            assert (rgb[:, :, 0] == (7 * x + 13 * y + 17 * f + seed) % 256).all()
            assert (rgb[:, :, 1] == (11 * x + 5 * y + 19 * f + seed) % 256).all()
            assert (rgb[:, :, 2] == (3 * x + 23 * y + 29 * f + seed) % 256).all()
        # the container-metadata parser agrees with the full decode
        assert M.parse_container(payload) == ("video", w, h, nf)


def test_avi_decoder_rejects_compressed_and_truncated():
    import struct

    import pytest as _pytest

    from table_streaming_source_spark.operators import multimodal as M

    good = M.synth_avi_video(8, 8, 2, 1)
    bad = bytearray(good)
    i = bad.find(b"strf")
    struct.pack_into("<I", bad, i + 8 + 16, 1)  # biCompression = BI_RLE8
    with _pytest.raises(ValueError, match="unsupported DIB"):
        M.avi_frames(bytes(bad))
    with _pytest.raises(ValueError):
        M.avi_frames(good[:60])  # truncated container
    with _pytest.raises(ValueError):
        M.avi_frames(b"RIFF\x04\x00\x00\x00WAVE")  # wrong RIFF type


def test_avi_frame_stats_samples_stride_on_spark(spark):
    import numpy as np

    from table_streaming_source_spark.operators import multimodal as M

    df = spark.range(4, 8).withColumnRenamed("id", "key")
    vids = M.attach_avi_video_payload(df, "key")
    got = {
        (r.key, r.frame): r
        for r in M.avi_frame_stats(vids, stride=2).collect()
    }
    for k in range(4, 8):
        w, h, nf = 8 + (5 * k) % 16, 8 + (3 * k) % 16, 2 + k % 4
        want_frames = [f for f in range(nf) if f % 2 == 0]
        assert sorted(f for kk, f in got if kk == k) == want_frames
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        pos = x + w * y
        for f in want_frames:
            r = (7 * x + 13 * y + 17 * f + k) % 256
            row = got[(k, f)]
            assert (row.width, row.height) == (w, h)
            assert row.sum_r == int(r.sum())
            assert row.wsum_r == int((pos * r).sum())


def test_avi_decoder_binds_video_strf_in_multistream_file():
    """An AVI with both a vids and an auds stream must decode from the
    VIDEO BITMAPINFOHEADER — an audio WAVEFORMATEX must neither
    overwrite it nor be misparsed as one; audio-only files reject."""
    import struct

    import numpy as np
    import pytest as _pytest

    from table_streaming_source_spark.operators import multimodal as M

    def chunk(cid, data):
        return cid + struct.pack("<I", len(data)) + data + (
            b"\x00" if len(data) & 1 else b""
        )

    def lst(t, p):
        return b"LIST" + struct.pack("<I", 4 + len(p)) + t + p

    w, h, nf, seed = 8, 8, 2, 3
    stride = (3 * w + 3) & ~3
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    frames = []
    for f in range(nf):
        r = ((7 * x + 13 * y + 17 * f + seed) % 256).astype(np.uint8)
        g = ((11 * x + 5 * y + 19 * f + seed) % 256).astype(np.uint8)
        b = ((3 * x + 23 * y + 29 * f + seed) % 256).astype(np.uint8)
        dib = np.flipud(np.stack([b, g, r], axis=-1))
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : 3 * w] = dib.reshape(h, 3 * w)
        frames.append(rows.tobytes())
    avih = struct.pack(
        "<14I", 40000, 0, 0, 0, nf, 0, 2, 0, w, h, 0, 0, 0, 0
    )
    strh_v = (
        b"vids" + b"DIB "
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 25, 0, nf, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf_v = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0
    )
    strh_a = (
        b"auds" + b"\x00" * 4
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 16000, 0, 100, 0, 0, 2)
        + struct.pack("<hhhh", 0, 0, 0, 0)
    )
    # ≥40 bytes so the old last-strf-wins code would misparse it
    strf_a = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16) + b"\x00" * 28
    movi = lst(b"movi", b"".join(chunk(b"00db", fr) for fr in frames))

    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh_v) + chunk(b"strf", strf_v))
        + lst(b"strl", chunk(b"strh", strh_a) + chunk(b"strf", strf_a)),
    )
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    frames_out = M.avi_frames(avi)
    assert len(frames_out) == nf
    assert (frames_out[0][:, :, 0] == (7 * x + 13 * y + seed) % 256).all()

    hdrl_a = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh_a) + chunk(b"strf", strf_a)),
    )
    body = b"AVI " + hdrl_a + movi
    with _pytest.raises(ValueError, match="without a BITMAPINFOHEADER"):
        M.avi_frames(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_jpeg_progressive_hand_assembled_bitstream_anchor():
    """Independent spec anchor: a progressive stream assembled BY HAND
    from T.81 (not via our encoder) — DC first pass carries diff=5 as
    Annex-K category-3 code '100'+'101' under point transform Al=1, the
    refinement scan contributes bit 1 (with 0xFF byte stuffing forced
    by the padding), and each AC band is one 9-bit EOB0 from the
    custom progressive table.  DC = (5<<1)|1 = 11 → S00 = 88 → flat
    block 11 → pixel 139 everywhere.  Proves the decoder semantics
    independently of encoder/decoder co-evolution."""
    import struct

    from table_streaming_source_spark.operators import multimodal as M

    def seg(marker, body):
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    q = [8] + [16] * 63
    qzz = bytes(q[M._JPEG_ZIGZAG[i]] for i in range(64))
    f = bytearray(b"\xff\xd8")
    f += seg(0xDB, b"\x00" + qzz)
    f += seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes((1, 0x11, 0)))
    f += seg(0xC4, b"\x00" + bytes(M._JPEG_DC_BITS) + bytes(M._JPEG_DC_VALS))
    f += seg(
        0xC4,
        b"\x11" + bytes(M._JPEG_PROG_AC_BITS) + bytes(M._JPEG_PROG_AC_VALS),
    )
    # DC first (Al=1): cat-3 '100' + magnitude '101' + pad '11' = 0x97
    f += seg(0xDA, bytes((1, 1, 0x00, 0, 0, 0x01))) + bytes([0b10010111])
    # DC refinement: correction bit 1 + all-ones padding = 0xFF (stuffed)
    f += seg(0xDA, bytes((1, 1, 0x00, 0, 0, 0x10))) + bytes([0xFF, 0x00])
    # AC bands: one EOB0 (9-bit code 000000000) + padding
    for ss, se in ((1, 5), (6, 63)):
        f += seg(0xDA, bytes((1, 1, 0x01, ss, se, 0x00))) + bytes(
            [0x00, 0x7F]
        )
    f += b"\xff\xd9"
    plane = M.jpeg_planes(bytes(f))[0]
    assert plane.shape == (8, 8)
    assert (plane == 139).all()


def test_jpeg_progressive_without_scans_raises():
    """SOF2 + headers + EOI but NO scan must raise like its baseline
    twin, not fabricate an all-gray plane from zero coefficients."""
    import struct

    import pytest

    from table_streaming_source_spark.operators import multimodal as M

    def seg(marker, body):
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    q = [8] + [16] * 63
    qzz = bytes(q[M._JPEG_ZIGZAG[i]] for i in range(64))
    f = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + qzz)
        + seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes((1, 0x11, 0)))
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="without SOS"):
        M.jpeg_planes(f)


# ---------------------------------------------------------------------------
# IMA-ADPCM: general-decoder paths the closed-form fixture can't reach
# ---------------------------------------------------------------------------

def _ima_reference(nibbles, pred, idx):
    """Straight-line reference decode (independent loop shape from the
    production decoder's byte/nibble walker)."""
    from table_streaming_source_spark.operators.multimodal import (
        _IMA_INDEX,
        _IMA_STEPS,
    )

    out = [pred]
    for nib in nibbles:
        step = _IMA_STEPS[idx]
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        pred = pred - diff if nib & 8 else pred + diff
        pred = min(max(pred, -32768), 32767)
        idx = min(max(idx + _IMA_INDEX[nib & 7], 0), 88)
        out.append(pred)
    return out


def _wrap_adpcm_blocks(blocks, block_align, n_samples_per_block):
    import struct

    data = b"".join(blocks)
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, 8000, 4000, block_align, 4, 2,
        n_samples_per_block,
    )
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _pack_block(pred, idx, nibbles):
    import struct

    packed = bytearray()
    for j in range(0, len(nibbles), 2):
        packed.append(nibbles[j] | (nibbles[j + 1] << 4))
    return struct.pack("<hBB", pred, idx, 0) + bytes(packed)


def test_adpcm_large_magnitudes_and_index_growth():
    """Nibbles with magnitude ≥ 4 push the step index UP (adaptation
    +2/+4/+6/+8) — the half of the index table the catalog fixture never
    uses."""
    from table_streaming_source_spark.operators.multimodal import adpcm_pcm

    nibbles = [7, 15, 6, 14, 5, 13, 4, 12] * 8
    wav = _wrap_adpcm_blocks(
        [_pack_block(100, 5, nibbles)], 4 + len(nibbles) // 2,
        len(nibbles) + 1,
    )
    assert adpcm_pcm(wav).tolist() == _ima_reference(nibbles, 100, 5)


def test_adpcm_predictor_clamps_at_int16():
    """A run of max-magnitude positive nibbles from a high start must
    saturate at 32767 (and the index at 88), not overflow."""
    from table_streaming_source_spark.operators.multimodal import adpcm_pcm

    nibbles = [7] * 64
    wav = _wrap_adpcm_blocks(
        [_pack_block(30000, 80, nibbles)], 4 + len(nibbles) // 2,
        len(nibbles) + 1,
    )
    got = adpcm_pcm(wav)
    assert got.tolist() == _ima_reference(nibbles, 30000, 80)
    assert got.max() == 32767


def test_adpcm_multi_block_resets_state():
    """Each block restarts from its own header predictor/index — state
    never leaks across blocks."""
    from table_streaming_source_spark.operators.multimodal import adpcm_pcm

    n1 = [3, 11, 7, 15] * 4
    n2 = [1, 9] * 8
    ba = 4 + len(n1) // 2
    wav = _wrap_adpcm_blocks(
        [_pack_block(-500, 20, n1), _pack_block(700, 0, n2)], ba,
        len(n1) + 1,
    )
    exp = _ima_reference(n1, -500, 20) + _ima_reference(n2, 700, 0)
    assert adpcm_pcm(wav).tolist() == exp


def test_adpcm_rejects_pcm_and_stereo():
    import struct

    from table_streaming_source_spark.operators.multimodal import (
        adpcm_pcm,
        synth_wav,
    )

    with pytest.raises(ValueError, match="IMA ADPCM"):
        adpcm_pcm(synth_wav(100))
    fmt = struct.pack("<HHIIHHHH", 0x11, 2, 8000, 4000, 12, 4, 2, 17)
    stereo = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    )
    with pytest.raises(ValueError, match="IMA ADPCM"):
        adpcm_pcm(stereo)


def test_adpcm_fixture_stream_is_clamp_free_and_spec_sized():
    """The catalog fixture's closed-form guarantee: index only decays,
    predictor never clamps, sample count = nibbles + 1."""
    from table_streaming_source_spark.operators.multimodal import (
        _adpcm_nibbles,
        adpcm_pcm,
        synth_wav_adpcm,
    )

    for key in (0, 7, 39, 40, 63, 101, 4999):
        s = adpcm_pcm(synth_wav_adpcm(key))
        _, nibs = _adpcm_nibbles(key)
        assert len(s) == len(nibs) + 1
        assert abs(s).max() < 32767


# ---------------------------------------------------------------------------
# FLAC: general-decoder paths the tone fixture can't reach
# ---------------------------------------------------------------------------

def _flac_frame(blk, subframe_writer, block_index=0):
    """Assemble one spec-valid mono 16-bit frame around a custom
    subframe body."""
    import struct

    from table_streaming_source_spark.operators.multimodal import (
        _crc8,
        _crc16,
        _flac_utf8_number,
        _FlacBitWriter,
    )

    hdr = _FlacBitWriter()
    hdr.write(0x3FFE, 14); hdr.write(0, 1); hdr.write(0, 1)
    hdr.write(0b0111, 4); hdr.write(0b1001, 4)
    hdr.write(0, 4); hdr.write(0b100, 3); hdr.write(0, 1)
    hdr.align()
    head = hdr.bytes() + _flac_utf8_number(block_index)
    head += struct.pack(">H", len(blk) - 1)
    head += bytes([_crc8(head)])
    body = _FlacBitWriter()
    subframe_writer(body)
    body.align()
    frame = head + body.bytes()
    return frame + struct.pack(">H", _crc16(frame))


def _flac_file(samples, frames):
    import hashlib
    import struct

    from table_streaming_source_spark.operators.multimodal import (
        _FlacBitWriter,
    )

    si = _FlacBitWriter()
    si.write(16, 16); si.write(65535, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(44100, 20); si.write(0, 3); si.write(15, 5)
    si.write(len(samples), 36)
    raw = b"".join(struct.pack("<h", s) for s in samples)
    streaminfo = si.bytes() + hashlib.md5(raw).digest()
    meta = bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo
    return b"fLaC" + meta + b"".join(frames)


def test_flac_constant_and_verbatim_subframes():
    from table_streaming_source_spark.operators.multimodal import flac_pcm

    const_blk = [-123] * 24

    def write_const(b):
        b.write(0, 1); b.write(0, 6); b.write(0, 1)
        b.write(-123 & 0xFFFF, 16)

    verb_blk = [5, -5, 32767, -32768] * 4

    def write_verb(b):
        b.write(0, 1); b.write(1, 6); b.write(0, 1)
        for s in verb_blk:
            b.write(s & 0xFFFF, 16)

    payload = _flac_file(
        const_blk + verb_blk,
        [_flac_frame(const_blk, write_const, 0),
         _flac_frame(verb_blk, write_verb, 1)],
    )
    assert flac_pcm(payload).tolist() == const_blk + verb_blk


def test_flac_rice_escape_and_partition_order():
    """Partition order 1 (two partitions) with the second escape-coded
    (raw 5-bit residuals) — the fixture always uses order 0, no
    escapes."""
    from table_streaming_source_spark.operators.multimodal import flac_pcm

    blk = [10, 11, 13, 10, 4, -2, 6, 9, 12, 1, -8, 0, 3, 3, -1, 2]
    order = 1
    res = [blk[i] - blk[i - 1] for i in range(1, len(blk))]
    p1 = res[: len(blk) // 2 - order]
    p2 = res[len(blk) // 2 - order:]

    def write_fixed(b):
        b.write(0, 1); b.write(0b001000 | order, 6); b.write(0, 1)
        b.write(blk[0] & 0xFFFF, 16)
        b.write(0b00, 2)
        b.write(1, 4)            # partition order 1
        b.write(3, 4)            # rice param 3 for partition 1
        for x in p1:
            z = (x << 1) if x >= 0 else ((-x) << 1) - 1
            b.write_unary(z >> 3)
            b.write(z, 3)
        b.write(15, 4)           # escape
        b.write(5, 5)            # 5 raw bits
        for x in p2:
            b.write(x & 0x1F, 5)

    payload = _flac_file(blk, [_flac_frame(blk, write_fixed)])
    assert flac_pcm(payload).tolist() == blk


def test_flac_fixed_orders_3_and_4():
    from table_streaming_source_spark.operators.multimodal import (
        flac_pcm,
        _FlacBitWriter,
    )
    import random

    rng = random.Random(11)
    blk = [rng.randrange(-900, 900) for _ in range(40)]

    for order, coef in ((3, [3, -3, 1]), (4, [4, -6, 4, -1])):
        res = []
        for i in range(order, len(blk)):
            pred = sum(c * blk[i - 1 - j] for j, c in enumerate(coef))
            res.append(blk[i] - pred)

        def write_fixed(b, order=order, res=res):
            b.write(0, 1); b.write(0b001000 | order, 6); b.write(0, 1)
            for w in blk[:order]:
                b.write(w & 0xFFFF, 16)
            b.write(0b00, 2); b.write(0, 4)
            mx = max(abs(x) for x in res)
            param = min(14, max(1, (2 * mx + 1).bit_length() - 1))
            b.write(param, 4)
            for x in res:
                z = (x << 1) if x >= 0 else ((-x) << 1) - 1
                b.write_unary(z >> param)
                b.write(z, param)

        payload = _flac_file(blk, [_flac_frame(blk, write_fixed)])
        assert flac_pcm(payload).tolist() == blk, order


def test_flac_header_crc_mismatch_raises():
    from table_streaming_source_spark.operators.multimodal import (
        flac_pcm,
        synth_flac,
    )

    good = bytearray(synth_flac(7))
    # find the first frame sync (0xFF 0xF8) after metadata and corrupt a
    # header byte (the 16-bit blocksize field two bytes later)
    idx = good.find(b"\xff\xf8", 4)
    assert idx > 0
    good[idx + 5] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        flac_pcm(bytes(good))


def test_flac_lpc_subframe_quarantines():
    from table_streaming_source_spark.operators.multimodal import flac_pcm

    blk = [0] * 8

    def write_lpc(b):
        b.write(0, 1); b.write(0b100000, 6); b.write(0, 1)

    payload = _flac_file(blk, [_flac_frame(blk, write_lpc)])
    with pytest.raises(ValueError, match="LPC"):
        flac_pcm(payload)


def test_mjpeg_avi_rejects_uncompressed_and_vice_versa():
    from table_streaming_source_spark.operators.multimodal import (
        avi_frames,
        avi_mjpeg_frames,
        synth_avi_mjpeg,
        synth_avi_video,
    )

    mjpeg = synth_avi_mjpeg(16, 16, 2, 3)
    dib = synth_avi_video(16, 16, 2, 3)
    with pytest.raises(ValueError, match="MJPEG"):
        avi_mjpeg_frames(dib)
    with pytest.raises(ValueError, match="only uncompressed"):
        avi_frames(mjpeg)
    # step sampling decodes only the kept frames, tagged by index
    assert [f for f, _ in avi_mjpeg_frames(
        synth_avi_mjpeg(16, 16, 5, 1), step=2)] == [0, 2, 4]


def test_mjpeg_frame_geometry_and_sampling(spark):
    from table_streaming_source_spark.operators.multimodal import (
        attach_mjpeg_payload,
        mjpeg_frame_stats,
    )

    df = spark.createDataFrame([(2,), (5,)], "doc_id long")
    out = mjpeg_frame_stats(
        attach_mjpeg_payload(df, "doc_id"), step=2
    ).collect()
    got = {(r.key, r.frame_idx): (r.n_px, r.sum_p) for r in out}
    # key 2: 4 blocks wide x 2 high, 4 frames -> sampled 0, 2
    # key 5: 4x3 blocks? w=8*(2+5%3)=8*4, h=8*(2+5%2)=8*3, nf=2+5%3=4
    assert set(got) == {(2, 0), (2, 2), (5, 0), (5, 2)}
    for (k, f), (n_px, sum_p) in got.items():
        bw = 2 + k % 3
        bh = 2 + k % 2
        assert n_px == 64 * bw * bh
        exp = 64 * sum(
            (7 * bx + 13 * by + 17 * f + k) % 256
            for bx in range(bw) for by in range(bh)
        )
        assert sum_p == exp


def test_jpeg_420_rejects_other_subsampling_geometries():
    """4:2:2 (2×1) and 1×2 layouts must quarantine, not mis-decode."""
    import struct as _s

    from table_streaming_source_spark.operators.multimodal import (
        jpeg_planes,
        synth_jpeg_420,
    )

    good = bytearray(synth_jpeg_420(16, 16, 9))
    sof = bytes(good).find(b"\xff\xc0")
    # luma sampling byte lives at SOF body offset 7 (after len, prec,
    # h, w, ncomp, cid)
    good[sof + 2 + 2 + 6 + 1] = 0x21  # 4:2:2
    with pytest.raises(ValueError, match="subsampling"):
        jpeg_planes(bytes(good))


def test_jpeg_420_chroma_half_resolution_and_upsample():
    from table_streaming_source_spark.operators.multimodal import (
        jpeg_pixels,
        jpeg_planes,
        synth_jpeg_420,
    )

    payload = synth_jpeg_420(48, 32, 200)
    y, cb, cr = jpeg_planes(payload)
    assert y.shape == (32, 48)
    assert cb.shape == cr.shape == (16, 24)
    assert jpeg_pixels(payload).shape == (32, 48, 3)


def test_tiff_exif_both_endians_and_rejects():
    from table_streaming_source_spark.operators.multimodal import (
        synth_tiff_exif,
        tiff_exif_meta,
    )

    little = synth_tiff_exif(4)   # even → II
    big = synth_tiff_exif(5)      # odd → MM
    assert little[:2] == b"II" and big[:2] == b"MM"
    assert tiff_exif_meta(little)["width"] == 16 * (1 + 4 % 8)
    assert tiff_exif_meta(big)["orientation"] == 1 + 5 % 8
    with pytest.raises(ValueError, match="TIFF"):
        tiff_exif_meta(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="truncated"):
        tiff_exif_meta(little[:10])


def test_tiff_exif_out_of_line_offset_is_followed():
    """Corrupting the DateTimeOriginal offset must surface as a
    truncation error, proving the parser dereferences it rather than
    reading the inline bytes."""
    import struct

    from table_streaming_source_spark.operators.multimodal import (
        synth_tiff_exif,
        tiff_exif_meta,
    )

    raw = bytearray(synth_tiff_exif(2))
    # EXIF IFD starts after IFD0; its single entry's value-offset field
    # sits 2 (count) + 8 bytes in
    ifd0_size = 2 + 4 * 12 + 4
    voff_pos = 8 + ifd0_size + 2 + 8
    struct.pack_into("<I", raw, voff_pos, len(raw) + 100)
    with pytest.raises(ValueError, match="out-of-line"):
        tiff_exif_meta(bytes(raw))


def test_flac_frame_crc16_mismatch_raises():
    """A bit flip inside the frame body must fail the CRC-16 trailer,
    not decode to silently wrong samples."""
    from table_streaming_source_spark.operators.multimodal import (
        flac_pcm,
        synth_flac,
    )

    good = bytearray(synth_flac(3))
    idx = good.find(b"\xff\xf8", 4)
    assert idx > 0
    # corrupt a residual byte well past the CRC-8-protected header
    good[idx + 12] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        flac_pcm(bytes(good))


def test_mixed_audio_truncated_blob_quarantines():
    """A chunk header whose body is missing must surface as ValueError
    (quarantine), never struct.error."""
    import struct

    from table_streaming_source_spark.operators.multimodal import (
        _sniff_decode_audio,
    )

    trunc = (
        b"RIFF" + struct.pack("<I", 12) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)  # body promised, absent
    )
    with pytest.raises(ValueError):
        _sniff_decode_audio(trunc)


def test_progressive_color_interleaved_ac_scan_rejected():
    """T.81 forbids interleaved progressive AC scans; a hand-corrupted
    scan header declaring 3 components with Ss>0 must quarantine."""
    from table_streaming_source_spark.operators.multimodal import (
        jpeg_planes,
        synth_jpeg_progressive_color,
    )

    raw = bytearray(synth_jpeg_progressive_color(16, 16, 5))
    # find the first AC scan header (SOS with ns=1, Ss=1): FF DA len ns
    i = 0
    while True:
        i = raw.find(b"\xff\xda", i + 1)
        assert i > 0
        ns = raw[i + 4]
        if ns == 1:
            break
    # rewrite it to claim 3 components (shifting would break offsets, so
    # instead corrupt a copy of the DC scan: declare Ss=1 on the
    # interleaved header)
    j = raw.find(b"\xff\xda", 2)   # first (interleaved DC) scan
    ss_pos = j + 4 + 1 + 2 * raw[j + 4]
    raw[ss_pos] = 1  # Ss=1 on a 3-component scan header
    with pytest.raises(ValueError, match="interleaved progressive AC"):
        jpeg_planes(bytes(raw))


def test_progressive_color_matches_baseline_color_planes():
    """The progressive color pipeline must yield the same planes as the
    baseline 4:4:4 encoder for identical coefficient input."""
    from table_streaming_source_spark.operators.multimodal import (
        _JPEG_SYNTH_QTABLE,
        encode_jpeg_color_coeffs,
        jpeg_planes,
        synth_jpeg_progressive_color,
    )

    w, h, seed = 24, 16, 77
    prog = jpeg_planes(synth_jpeg_progressive_color(w, h, seed))

    def flat(v):
        blk = [0] * 64
        blk[0] = v - 128
        return blk

    bw, bh = w // 8, h // 8
    comps = [
        [flat((7 * bx + 13 * by + seed) % 256)
         for by in range(bh) for bx in range(bw)],
        [flat((5 * bx + 11 * by + seed) % 256)
         for by in range(bh) for bx in range(bw)],
        [flat((3 * bx + 17 * by + 2 * seed) % 256)
         for by in range(bh) for bx in range(bw)],
    ]
    base = jpeg_planes(
        encode_jpeg_color_coeffs(comps, w, h, _JPEG_SYNTH_QTABLE)
    )
    for p, b in zip(prog, base):
        assert (p == b).all()


# ---------------------------------------------------------------------------
# ICO container (round 6)
# ---------------------------------------------------------------------------

def test_ico_roundtrip_pixels_and_mask():
    """synth → decode recovers exact pixels per the shared formula and
    the AND mask per (x+y+key)%5 — both resolutions."""
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        ico_frames,
        synth_ico,
    )

    key = 7
    spec = [(9, 6, 42, key), (4, 3, 59, key)]
    frames = ico_frames(synth_ico(spec))
    assert len(frames) == 2
    for (w, h, s, k), (rgb, mask) in zip(spec, frames):
        assert rgb.shape == (h, w, 3) and mask.shape == (h, w)
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        assert (rgb[:, :, 0] == (7 * x + 13 * y + s) % 256).all()
        assert (rgb[:, :, 1] == (11 * x + 5 * y + s) % 256).all()
        assert (rgb[:, :, 2] == (3 * x + 23 * y + s) % 256).all()
        assert (mask == ((x + y + k) % 5 == 0)).all()


def test_ico_directory_offsets_are_honored():
    """Entries are located by their directory OFFSET, not assumed
    contiguous: injecting slack bytes between images must not change
    the decode."""
    import struct as _struct

    from table_streaming_source_spark.operators.multimodal import (
        ico_frames,
        synth_ico,
    )

    raw = bytearray(synth_ico([(5, 4, 1, 3), (3, 3, 18, 3)]))
    # shift the SECOND image 8 bytes later and patch its offset
    off2 = _struct.unpack("<I", raw[6 + 16 + 12 : 6 + 16 + 16])[0]
    moved = raw[:off2] + b"\x00" * 8 + raw[off2:]
    moved[6 + 16 + 12 : 6 + 16 + 16] = _struct.pack("<I", off2 + 8)
    a = ico_frames(bytes(raw))
    b = ico_frames(bytes(moved))
    for (ra, ma), (rb, mb) in zip(a, b):
        assert (ra == rb).all() and (ma == mb).all()


def test_ico_rejects_non_icon_and_wrong_depth():
    import struct as _struct

    import pytest as _pytest

    from table_streaming_source_spark.operators.multimodal import (
        ico_frames,
        synth_ico,
    )

    raw = bytearray(synth_ico([(4, 4, 0, 1)]))
    cur = bytearray(raw)
    cur[2:4] = _struct.pack("<H", 2)  # type=2 is CUR, not ICO
    with _pytest.raises(ValueError, match="not an ICO"):
        ico_frames(bytes(cur))
    bad = bytearray(raw)
    # bitcount lives 14 bytes into the DIB header (offset 22 of the blob)
    off = _struct.unpack("<I", raw[6 + 12 : 6 + 16])[0]
    bad[off + 14 : off + 16] = _struct.pack("<H", 8)
    with _pytest.raises(ValueError, match="only 24-bit"):
        ico_frames(bytes(bad))


# ---------------------------------------------------------------------------
# round 7: paletted PNG
# ---------------------------------------------------------------------------


def test_png_palette_roundtrip_resolves_palette_and_trns():
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        png_pixels_palette,
        synth_png_palette,
    )

    w, h, seed = 11, 9, 5
    rgb, alpha = png_pixels_palette(synth_png_palette(w, h, seed))
    assert rgb.shape == (h, w, 3) and alpha.shape == (h, w)
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    idx = (x + 2 * y + seed) % 64
    assert (rgb[:, :, 0] == (3 * idx + seed) % 256).all()
    assert (rgb[:, :, 1] == (5 * idx + 1) % 256).all()
    assert (rgb[:, :, 2] == (7 * idx + 2) % 256).all()
    # prefix tRNS: indexes < 16 carry their alpha, the rest are opaque
    assert (alpha[idx < 16] == (idx[idx < 16] * 16) % 256).all()
    assert (alpha[idx >= 16] == 255).all()


def test_png_palette_rejects_non_palette_stream():
    import pytest as _pytest

    from table_streaming_source_spark.operators.multimodal import (
        png_pixels_palette,
        synth_png_filtered,
    )

    with _pytest.raises(ValueError):
        png_pixels_palette(synth_png_filtered(8, 8, 1))


# ---------------------------------------------------------------------------
# round 7: WebP lossless (VP8L)
# ---------------------------------------------------------------------------


def test_webp_roundtrip_exercises_full_grammar():
    """The synthesized fixture must drive every implemented bitstream
    feature: LZ77 copies, cache hits, simple AND full codes."""
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        synth_webp_image,
        webp_lossless_decode,
        webp_lossless_encode,
    )

    img = synth_webp_image(30, 20, 7)
    enc = webp_lossless_encode(img)
    assert enc[:4] == b"RIFF" and enc[8:16] == b"WEBPVP8L"
    dec = webp_lossless_decode(enc)
    assert (dec == img).all()
    # grammar coverage: re-tokenize the image the encoder's way
    argb = (
        (img[:, :, 3].astype(np.uint32) << 24)
        | (img[:, :, 0].astype(np.uint32) << 16)
        | (img[:, :, 1].astype(np.uint32) << 8)
        | img[:, :, 2].astype(np.uint32)
    ).reshape(-1)
    runs = (argb[1:] == argb[:-1]).sum()
    assert runs > 30  # LZ77 path fires
    # alpha constant → simple (single-symbol) code path live
    assert (img[:, :, 3] == 255).all()


def test_webp_decoder_quarantines_unsupported_features():
    import struct as _struct

    import pytest as _pytest

    from table_streaming_source_spark.operators.multimodal import (
        synth_webp_image,
        webp_lossless_decode,
        webp_lossless_encode,
    )

    with _pytest.raises(ValueError, match="RIFF"):
        webp_lossless_decode(b"not a webp at all....")
    # a VP8 (lossy) container routes to quarantine, not garbage
    lossy = b"RIFF" + _struct.pack("<I", 20) + b"WEBP" + b"VP8 " + b"\0" * 8
    with _pytest.raises(ValueError, match="VP8L"):
        webp_lossless_decode(lossy)
    # flip the transform-present bit of a valid stream → named error
    enc = bytearray(webp_lossless_encode(synth_webp_image(8, 8, 1)))
    # header: 21 bytes in, bit offset 14+14+1+3 = 32 → byte 25, bit 0
    enc[21 + 4] ^= 1
    with _pytest.raises(ValueError, match="transform"):
        webp_lossless_decode(bytes(enc))


# ---------------------------------------------------------------------------
# round 7: interlaced GIF, RLE8 BMP
# ---------------------------------------------------------------------------


def test_gif_interlaced_decodes_to_display_order():
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        gif_pixels,
        synth_gif_interlaced,
        synth_gif_pixels,
    )

    for w, h, seed in [(10, 9, 3), (17, 23, 7), (5, 1, 0), (8, 2, 1)]:
        a = gif_pixels(synth_gif_interlaced(w, h, seed))
        b = gif_pixels(synth_gif_pixels(w, h, seed))
        assert (a == b).all(), (w, h, seed)
    # the stream genuinely permutes rows: decoding WITHOUT deinterlace
    # (simulated via the pass order) differs for h > 2
    x = np.arange(10)[None, :]
    y = np.arange(9)[:, None]
    img = (7 * x + 13 * y + 3) % 256
    from table_streaming_source_spark.operators.multimodal import (
        _gif_interlace_order,
    )
    assert _gif_interlace_order(9) != list(range(9))


def test_bmp_rle8_roundtrip_and_delta_escape():
    import struct

    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        bmp_rle8_pixels,
        synth_bmp_rle8,
    )

    for w, h, seed in [(8, 6, 0), (19, 15, 7), (3, 1, 2), (26, 20, 13)]:
        got = bmp_rle8_pixels(synth_bmp_rle8(w, h, seed))
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        want = ((7 * (x // 6) + 13 * y + seed) % 256).astype(np.uint8)
        assert (got == want).all(), (w, h, seed)
    # hand-built stream with a DELTA escape: run, delta(+1,+1), run
    pal = bytes(c for i in range(256) for c in (i, i, i, 0))
    stream = bytes([2, 200, 0, 2, 1, 1, 1, 50, 0, 0, 0, 1])
    info = struct.pack(
        "<IiiHHIIiiII", 40, 4, 3, 1, 8, 1, len(stream), 0, 0, 256, 0
    )
    off = 14 + 40 + len(pal)
    hdr = struct.pack("<2sIHHI", b"BM", off + len(stream), 0, 0, off)
    img = bmp_rle8_pixels(hdr + info + pal + stream)
    assert img[2, 0] == 200 and img[2, 1] == 200  # bottom storage row
    assert img[1, 3] == 50  # delta skipped to (x=3, next row up)
    assert img[2, 2] == 0 and img[0].sum() == 0  # skipped pixels stay 0


def test_bmp_rle8_rejects_uncompressed_and_overflow():
    import pytest as _pytest

    from table_streaming_source_spark.operators.multimodal import (
        bmp_rle8_pixels,
        synth_bmp,
        synth_bmp_rle8,
    )

    with _pytest.raises(ValueError, match="BI_RLE8"):
        bmp_rle8_pixels(synth_bmp(8, 6, 1))
    # truncate the stream before end-of-bitmap
    data = synth_bmp_rle8(8, 6, 1)
    with _pytest.raises(ValueError):
        bmp_rle8_pixels(data[:-2])


# ---------------------------------------------------------------------------
# round 7 continuation: QOI
# ---------------------------------------------------------------------------


def test_qoi_roundtrip_exercises_every_op():
    """Every fixture seed must drive all five QOI op kinds (RGB /
    INDEX / DIFF / LUMA / RUN) and decode back bit-exact."""
    from table_streaming_source_spark.operators.multimodal import (
        _qoi_formula_pixels,
        qoi_encode,
        qoi_pixels,
    )

    for seed in range(8):
        w, h = 8 + (5 * seed) % 21, 8 + (11 * seed) % 17
        img = _qoi_formula_pixels(w, h, seed)
        payload = qoi_encode(img)
        assert payload[:4] == b"qoif" and payload[-8:] == b"\0" * 7 + b"\x01"
        assert (qoi_pixels(payload) == img).all()
        ops = {"rgb": 0, "index": 0, "diff": 0, "luma": 0, "run": 0}
        pos, n = 14, 0
        while n < w * h:
            b1 = payload[pos]
            pos += 1
            if b1 == 0xFE:
                ops["rgb"] += 1
                pos += 3
                n += 1
            elif b1 >> 6 == 0:
                ops["index"] += 1
                n += 1
            elif b1 >> 6 == 1:
                ops["diff"] += 1
                n += 1
            elif b1 >> 6 == 2:
                ops["luma"] += 1
                pos += 1
                n += 1
            else:
                ops["run"] += 1
                n += (b1 & 0x3F) + 1
        assert all(v > 0 for v in ops.values()), (seed, ops)


def test_qoi_random_images_roundtrip():
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        qoi_encode,
        qoi_pixels,
    )

    rng = np.random.default_rng(0)
    for _ in range(25):
        h, w = (int(v) for v in rng.integers(1, 40, 2))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        if h > 2:
            img[1] = img[0]  # guarantee a run boundary crossing rows
        assert (qoi_pixels(qoi_encode(img)) == img).all()


def test_qoi_decoder_quarantines_malformed_payloads():
    import pytest as _pytest

    from table_streaming_source_spark.operators.multimodal import (
        _qoi_formula_pixels,
        qoi_encode,
        qoi_pixels,
    )

    with _pytest.raises(ValueError, match="QOI"):
        qoi_pixels(b"nope" + b"\0" * 20)
    good = bytearray(qoi_encode(_qoi_formula_pixels(12, 10, 2)))
    # truncate mid-stream
    with _pytest.raises(ValueError, match="truncated|marker|overflow"):
        qoi_pixels(bytes(good[:20]) + b"\0" * 7 + b"\x01")
    # corrupt the end marker
    bad = bytearray(good)
    bad[-1] = 0x02
    with _pytest.raises(ValueError, match="end marker"):
        qoi_pixels(bytes(bad))
    # 4-channel header routes to the named unsupported path
    bad4 = bytearray(good)
    bad4[12] = 4
    with _pytest.raises(ValueError, match="3-channel"):
        qoi_pixels(bytes(bad4))


def test_pnm_forms_agree_and_quarantine():
    import numpy as np
    import pytest

    from table_streaming_source_spark.operators.multimodal import (
        pnm_pixels,
        synth_pnm,
    )

    a = pnm_pixels(synth_pnm(11, 9, 42, 0))  # P6 binary RGB
    b = pnm_pixels(synth_pnm(11, 9, 42, 1))  # P3 ASCII RGB
    assert a.shape == (9, 11, 3) and (a == b).all()
    g = pnm_pixels(synth_pnm(11, 9, 42, 2))  # P5 gray = red channel
    assert g.shape == (9, 11, 1)
    assert (g[:, :, 0] == a[:, :, 0]).all()
    # comment skipping: inject an extra comment between dims and maxval
    p6 = synth_pnm(5, 4, 7, 0)
    patched = p6.replace(b"\n255\n", b"\n# extra comment\n255\n", 1)
    assert (pnm_pixels(patched) == pnm_pixels(p6)).all()
    with pytest.raises(ValueError, match="magic"):
        pnm_pixels(b"P7 nope")
    with pytest.raises(ValueError, match="size"):
        pnm_pixels(synth_pnm(5, 4, 7, 0)[:-1])
    with pytest.raises(ValueError, match="count"):
        pnm_pixels(synth_pnm(5, 4, 7, 1) + b" 9")
