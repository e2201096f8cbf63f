"""Hypothesis properties for the image codecs and the robots grammar.

The fixed-vector pins live in test_{imagecodec,gifcodec,bmpcodec,
jpegcodec}.py; here random inputs widen the net:

* lossless round-trip: PNG/GIF/BMP must return the exact pixels for
  ANY uint8 image within each codec's contract (GIF needs ≤256 colors
  — generated via a palette), at arbitrary odd/even dims (stride
  padding, interlace pass boundaries).
* cross-codec agreement: all three decoders must agree pixel-for-pixel
  on the same image, which is exactly the invariant
  multimodal.pixel_fingerprint's dedup rests on.
* robots grammar: parse_robots_rules / parse_crawl_delay vs
  urllib.robotparser (the independent stdlib oracle) on GENERATED
  policies — entry scoping, grouped user-agents, comments, junk lines.
"""

import urllib.robotparser

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from blockchainspider_spark.functions.bmpcodec import bmp_decode, bmp_encode
from blockchainspider_spark.functions.gifcodec import gif_decode, gif_encode
from blockchainspider_spark.functions.imagecodec import png_decode, png_encode
from blockchainspider_spark.functions.robots import (
    parse_crawl_delay,
    parse_robots_rules,
)


@st.composite
def paletted_images(draw):
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    n_colors = draw(st.integers(1, 16))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), np.uint8)
    return pal[rng.integers(0, n_colors, (h, w))]


@settings(max_examples=60, deadline=None)
@given(img=paletted_images())
def test_codec_roundtrips_and_cross_agreement(img):
    png = png_decode(png_encode(img))
    gif = gif_decode(gif_encode(img))
    bmp = bmp_decode(bmp_encode(img))
    assert (png == img).all()
    assert (gif == img).all()
    assert (bmp == img).all()


_UA = ["*", "bigbot", "other"]
_PATH = ["/", "/a", "/a/b", "/tmp", "/enc%20oded", ""]


@st.composite
def robots_policies(draw):
    lines = []
    for _ in range(draw(st.integers(0, 12))):
        kind = draw(st.sampled_from(
            ["ua", "disallow", "allow", "delay", "blank", "ws",
             "comment", "junk"]
        ))
        if kind == "ua":
            lines.append(f"User-agent: {draw(st.sampled_from(_UA))}")
        elif kind == "disallow":
            lines.append(f"Disallow: {draw(st.sampled_from(_PATH))}")
        elif kind == "allow":
            lines.append(f"Allow: {draw(st.sampled_from(_PATH))}")
        elif kind == "delay":
            lines.append(
                f"Crawl-delay: {draw(st.sampled_from(['3', '10', '1.5', 'x']))}"
            )
        elif kind == "blank":
            lines.append("")
        elif kind == "ws":
            lines.append("   ")  # robotparser: NOT an entry terminator
        elif kind == "comment":
            lines.append("# a comment")
        else:
            lines.append("no colon here")
    return "\n".join(lines)


@settings(max_examples=120, deadline=None)
@given(txt=robots_policies())
def test_robots_grammar_matches_stdlib(txt):
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(txt.splitlines())
    assert parse_crawl_delay(txt) == rp.crawl_delay("*"), txt
    rules = parse_robots_rules(txt)
    # first-match-wins over the ordered (prefix, allow) rules — exactly
    # what apply_robots_gate evaluates JVM-side. Allow lines, allow-all
    # blank Disallows, and rule shadowing are all modeled (this property
    # caught the unordered prefix-set model live: "Disallow:" before
    # "Disallow: /" must allow everything).
    for path in ["/", "/a", "/a/b/c", "/tmp/x", "/enc%20oded/y", "/other"]:
        allowed = next((allow for p, allow in rules if path.startswith(p)), True)
        assert allowed == rp.can_fetch("*", f"http://h{path}"), (txt, path)


@st.composite
def rgb_images(draw):
    h = draw(st.integers(1, 40))
    w = draw(st.integers(1, 40))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), np.uint8)


@settings(max_examples=40, deadline=None)
@given(img=rgb_images(), quality=st.integers(5, 100),
       sub=st.sampled_from(["444", "420"]),
       restart=st.sampled_from([0, 0, 0, 1, 3]))
def test_progressive_jpeg_equals_baseline(img, quality, sub, restart):
    """Progressive (SOF2) re-encoding is lossless over the quantized
    coefficients, so decode(progressive) must equal decode(baseline)
    BIT-EXACTLY for any image/quality/subsampling/restart interval —
    one property covering every Annex-G scan type the script emits
    (DC first/refine, banded AC firsts at two shifts, AC refines with
    EOB-run correction bits)."""
    from blockchainspider_spark.functions.jpegcodec import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    base = jpeg_decode(jpeg_encode(img, quality=quality, subsampling=sub))
    prog = jpeg_decode(jpeg_encode_progressive(
        img, quality=quality, subsampling=sub, restart_interval=restart))
    assert np.array_equal(base, prog)


@st.composite
def paletted_animations(draw):
    n = draw(st.integers(1, 5))
    h = draw(st.integers(1, 16))
    w = draw(st.integers(1, 16))
    n_colors = draw(st.integers(1, 12))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), np.uint8)
    # mix of static and changing frames so the delta optimizer hits
    # full-rect, sub-rect, and identical-frame (1x1 transparent) paths
    frames = [pal[rng.integers(0, n_colors, (h, w))]]
    for _ in range(n - 1):
        if rng.integers(0, 3) == 0:
            frames.append(frames[-1].copy())
        else:
            nxt = frames[-1].copy()
            y0, x0 = rng.integers(0, h), rng.integers(0, w)
            y1, x1 = rng.integers(y0, h) + 1, rng.integers(x0, w) + 1
            nxt[y0:y1, x0:x1] = pal[rng.integers(0, n_colors,
                                                 (y1 - y0, x1 - x0))]
            frames.append(nxt)
    delays = [int(d) for d in rng.integers(1, 500, n)]
    return frames, delays


@settings(max_examples=50, deadline=None)
@given(anim=paletted_animations(), optimize=st.booleans())
def test_gif_animation_roundtrip(anim, optimize):
    """Animated GIF must return the exact composited frame stack and
    delays for ANY same-size paletted frames, optimized (sub-rect +
    transparent delta) or not."""
    from blockchainspider_spark.functions.gifcodec import (
        gif_decode_frames,
        gif_encode_animation,
    )

    frames, delays = anim
    data = gif_encode_animation(frames, delays, loop=2, optimize=optimize)
    dec, ddel, loop = gif_decode_frames(data)
    assert (ddel, loop) == (delays, 2)
    assert len(dec) == len(frames)
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)


@settings(max_examples=40, deadline=None)
@given(img=rgb_images(),
       comp=st.sampled_from(["none", "lzw", "packbits"]),
       bo=st.sampled_from(["II", "MM"]),
       rps=st.integers(1, 40))
def test_tiff_roundtrip(img, comp, bo, rps):
    """TIFF must return the exact pixels for ANY uint8 image, either
    byte order, any strip height, all three compressions (LZW under
    the horizontal predictor) — early-change and inline-value layout
    stay pinned under random traffic."""
    from blockchainspider_spark.functions.tiffcodec import tiff_decode, tiff_encode

    data = tiff_encode(img, compression=comp, byte_order=bo, rows_per_strip=rps)
    assert np.array_equal(tiff_decode(data), img)


@settings(max_examples=40, deadline=None)
@given(img=rgb_images(), lz=st.booleans(),
       cb=st.sampled_from([0, 3, 8, 11]), sg=st.booleans())
def test_webp_vp8l_roundtrip(img, lz, cb, sg):
    """VP8L lossless must return the exact pixels for ANY uint8 image
    across the encoder's feature axes (LZ77 backrefs, color-cache
    sizes, subtract-green) — Huffman completeness, prefix-coded
    lengths/distances, and the cache hash stay pinned under random
    traffic."""
    from blockchainspider_spark.functions.webpcodec import webp_decode, webp_encode

    data = webp_encode(img, use_lz77=lz, cache_bits=cb, subtract_green=sg)
    assert np.array_equal(webp_decode(data), img)


# --------------------------------------------------------------- WARC
# (round-6 third continuation): framing is Content-Length-based, so
# payloads containing CRLFCRLF, the WARC magic, or gzip magic must
# never confuse the parser; gzip membership varies per record.

@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.tuples(
        st.binary(min_size=0, max_size=200),                    # payload
        st.integers(min_value=0, max_value=999),                # uri salt
        st.booleans(),                                          # gzip?
        st.sampled_from([200, 301, 404, 500]),                  # status
    ),
    min_size=1, max_size=6,
))
def test_warc_roundtrip_arbitrary_payloads(recs):
    from blockchainspider_spark.functions.warc import (
        build_response_record, parse_warc,
    )

    adversarial = [b"\r\n\r\n", b"WARC/1.1\r\n", b"\x1f\x8b\x08tail"]
    data = b""
    want = []
    for i, (payload, salt, gz, status) in enumerate(recs):
        payload = payload + adversarial[i % 3]  # embed framing look-alikes
        uri = f"http://h{salt % 7}.ex.test/p/{salt}"
        data += build_response_record(uri, status, "X", "application/octet-stream",
                                      payload, gzip_member=gz)
        want.append((uri, status, payload))
    got = parse_warc(data)
    assert [(r["target_uri"], r["http_status"], r["payload"]) for r in got] == want
    # offsets tile the compressed stream exactly
    assert got[0]["offset"] == 0
    for a, b in zip(got, got[1:]):
        assert b["offset"] == a["offset"] + a["length"]
    assert got[-1]["offset"] + got[-1]["length"] == len(data)


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet="abc/\r\n?=&", min_size=1, max_size=30))
def test_warc_header_injection_refused_or_safe(uri):
    from blockchainspider_spark.functions.warc import (
        WarcError, build_response_record, parse_warc,
    )

    try:
        rec = build_response_record(f"http://x/{uri}", 200, "OK",
                                    "text/plain", b"p")
    except WarcError:
        assert "\r" in uri or "\n" in uri  # refusal only for CR/LF
        return
    (r,) = parse_warc(rec)  # accepted values must round-trip cleanly
    assert r["target_uri"] == f"http://x/{uri}"


# ------------------------------------------------- Content-Encoding
@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=3000),
       st.sampled_from(["identity", "gzip-1", "gzip-2", "deflate", "deflate-raw"]))
def test_content_encoding_roundtrip(body, leg):
    import gzip as _g
    import io
    import zlib

    from blockchainspider_spark.functions.contentenc import (
        decode_content_encoding,
    )

    def gz(b):
        buf = io.BytesIO()
        with _g.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
            f.write(b)
        return buf.getvalue()

    if leg == "identity":
        raw, header = body, None
    elif leg == "gzip-1":
        raw, header = gz(body), "gzip"
    elif leg == "gzip-2":
        mid = len(body) // 2
        raw, header = gz(body[:mid]) + gz(body[mid:]), "gzip"
    elif leg == "deflate":
        raw, header = zlib.compress(body), "deflate"
    else:
        c = zlib.compressobj(wbits=-15)
        raw, header = c.compress(body) + c.flush(), "deflate"
    assert decode_content_encoding(raw, header) == body


# --------------------------------------------------------- charset
@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_decode_page_total_on_arbitrary_bytes(raw):
    from blockchainspider_spark.functions.charset import decode_page

    text, enc, src = decode_page(raw)  # must never raise
    assert isinstance(text, str)
    if enc in ("ascii", "utf-8") and src in ("ascii", "utf8"):
        # heuristic legs must round-trip the original bytes
        assert text.encode("utf-8") == raw
