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


def make_fetch_kernel(qps: float | None = None):
    """Build a mapInPandas kernel closing over the politeness budget."""

    def fetch_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_fetch: dict[str, float] = {}
        min_interval = (1.0 / qps) if qps else 0.0
        for pdf in batches:
            out = {k: [] for k in (
                "node", "image_id", "host", "wave", "depth", "seq", "caption_sha",
                "phash_decoded", "phash_match", "psnr_db", "psnr_ok", "fetch_ms",
            )}
            for row in pdf.itertuples(index=False):
                t0 = time.perf_counter()
                host = host_of(row.image_id)
                if min_interval:
                    wait = last_fetch.get(host, 0.0) + min_interval - time.monotonic()
                    if wait > 0:
                        time.sleep(wait)
                    last_fetch[host] = time.monotonic()
                pixels = decode(bytes(row.bytes), row.fmt)
                decoded_hash = phash64(pixels)
                # true reference pixels are a pure function of image_id in
                # the fixture world, so the PSNR invariant is end-to-end:
                # lossless must round-trip exactly, lossy must stay ≥40 dB
                reference = _pixels_for(row.image_id, int(row.w), int(row.h))
                db = psnr(reference, pixels)
                ok = db == float("inf") if row.fmt == "png" else db >= 40.0
                out["node"].append(row.node)
                out["image_id"].append(row.image_id)
                out["host"].append(host)
                out["wave"].append(row.wave)
                out["depth"].append(row.depth)
                out["seq"].append(row.seq)
                out["caption_sha"].append(hashlib.sha256(row.caption.encode()).hexdigest())
                out["phash_decoded"].append(decoded_hash)
                out["phash_match"].append(bool(decoded_hash == row.phash))
                out["psnr_db"].append(db)
                out["psnr_ok"].append(bool(ok))
                out["fetch_ms"].append((time.perf_counter() - t0) * 1000.0)
            yield pd.DataFrame(out)

    return fetch_kernel
