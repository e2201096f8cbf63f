"""Fetch stage: Arrow-batched payload decode + per-row invariants + politeness.

The "fetch" of the reference crawler (HTTP GET of a page / API payload)
maps to reading the payload row of the frontier node from the images
table and *verifying* it: decode the bytes, check the perceptual hash,
check PSNR ≥ 40 dB for lossy formats (BASELINE.json input_hint), and
hash the caption for byte-exact comparison. Runs as ``mapInPandas`` —
one Python invocation per Arrow batch; per-image numpy decode inside the
batch (the sanctioned vectorized-UDF shape for binary payloads).

Politeness (reference utils/bucket.py token bucket): partitions arrive
grouped by ``host_bucket``; within a partition a per-host token bucket
enforces ``qps`` by sleeping the remainder of ``1/qps`` between fetches
of the same host. Disabled (qps=None) for throughput benches, enabled
for the politeness tests.
"""

from __future__ import annotations

import hashlib
import time
from collections.abc import Iterator

import pandas as pd

from blockchainspider_spark.functions.imagecodec import decode, phash64, psnr


def _pixels_for(image_id: str, w: int, h: int):
    # late import: fixtures import this module's sibling (imagecodec)
    from blockchainspider_spark.fixtures.generators import _pixels_for as gen
    return gen(image_id, w, h)

FETCH_RESULT_SCHEMA = (
    "node string, image_id string, host string, wave int, depth int, seq long, "
    "caption_sha string, phash_decoded long, phash_match boolean, "
    "psnr_db double, psnr_ok boolean, fetch_ms double"
)


def host_of(image_id: str) -> str:
    """img://host-<b>/<name> → host-<b>  (canonical-URL host component)."""
    try:
        return image_id.split("/")[2]
    except (IndexError, AttributeError):
        return ""


def make_fetch_kernel(qps: float | None = None, proxy: str | None = None,
                      host_delays: dict[str, float] | None = None):
    """Build a mapInPandas kernel closing over the politeness budget.

    ``host_delays`` carries robots.txt Crawl-delay seconds per host
    (functions/robots.parse_crawl_delays — a tiny collected dim shipped
    in the closure): the effective per-host interval is
    ``max(1/qps, crawl_delay)``, so a host may slow the crawler below
    the global budget but never speed past it. Under ``proxy`` the
    pacing key is the proxy, and the strictest delay of any host in the
    batch governs it (one bottleneck, worst-case-honest).

    ``proxy`` models the reference's SOCKS5/Tor path (S17,
    middlewares/tor.py:15-72): all proxied fetches funnel through ONE
    bottleneck, so the pacing key collapses from per-host to the proxy
    itself — the token bucket serializes across hosts exactly as the Tor
    middleware's semaphore does. The actual socket hop is a no-op in
    this sandbox (payloads come from the images table), but the
    scheduling semantics — the part that affects crawl behavior — are
    real."""

    def fetch_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_fetch: dict[str, float] = {}
        min_interval = (1.0 / qps) if qps else 0.0
        delays = host_delays or {}
        for pdf in batches:
            if not len(pdf):
                continue
            # column-wise everywhere the work is per-string: host split,
            # caption hashing, output assembly. Only the decode/PSNR loop
            # is per-image (inherently per-payload), plus the politeness
            # sleep (inherently sequential within a host bucket).
            hosts = pdf["image_id"].map(host_of)
            caption_sha = pdf["caption"].map(
                lambda c: hashlib.sha256(c.encode()).hexdigest()
            )
            n = len(pdf)
            phash_decoded = [0] * n
            psnr_db = [0.0] * n
            fetch_ms = [0.0] * n
            fmts = pdf["fmt"].to_numpy()
            widths = pdf["w"].to_numpy()
            heights = pdf["h"].to_numpy()
            image_ids = pdf["image_id"].to_numpy()
            payloads = pdf["bytes"].to_numpy()
            for i in range(n):
                t0 = time.perf_counter()
                iv = max(min_interval, delays.get(hosts.iat[i], 0.0))
                if iv:
                    bucket = proxy if proxy is not None else hosts.iat[i]
                    wait = last_fetch.get(bucket, 0.0) + iv - time.monotonic()
                    if wait > 0:
                        time.sleep(wait)
                    last_fetch[bucket] = time.monotonic()
                pixels = decode(bytes(payloads[i]), fmts[i])
                phash_decoded[i] = phash64(pixels)
                # true reference pixels are a pure function of image_id in
                # the fixture world, so the PSNR invariant is end-to-end:
                # lossless must round-trip exactly, lossy must stay ≥40 dB
                reference = _pixels_for(image_ids[i], int(widths[i]), int(heights[i]))
                psnr_db[i] = psnr(reference, pixels)
                fetch_ms[i] = (time.perf_counter() - t0) * 1000.0
            psnr_s = pd.Series(psnr_db)
            yield pd.DataFrame({
                "node": pdf["node"].to_numpy(),
                "image_id": image_ids,
                "host": hosts.to_numpy(),
                "wave": pdf["wave"].to_numpy(),
                "depth": pdf["depth"].to_numpy(),
                "seq": pdf["seq"].to_numpy(),
                "caption_sha": caption_sha.to_numpy(),
                "phash_decoded": phash_decoded,
                "phash_match": pd.Series(phash_decoded).eq(pdf["phash"].reset_index(drop=True)),
                "psnr_db": psnr_s,
                "psnr_ok": (psnr_s == float("inf")).where(
                    pd.Series(fmts) == "png", psnr_s >= 40.0
                ),
                "fetch_ms": fetch_ms,
            })

    return fetch_kernel
