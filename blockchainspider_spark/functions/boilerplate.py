"""Boilerplate removal / main-content extraction for fetched HTML.

Every training-data pipeline strips navigation, footers and link farms
before dedup and quality scoring. The public algorithms (jusText,
Kohlschütter et al.'s boilerpipe, Arc90 readability) share one core
signal: segment the page into block-level text runs and drop blocks
whose **link density** (characters inside ``<a>`` / total characters)
is high or whose text is too short to be prose. This module implements
that line of attack on the stdlib ``html.parser`` (no bs4/lxml in the
container): a streaming block segmenter that tracks anchor depth and
skips ``script``/``style``, plus a classifier with the jusText-style
thresholds.

The reference's pipelines regex-strip tags wholesale
(BlockchainSpider item processing keeps whole page text); block-level
link-density classification is the part a 100-TB text corpus actually
needs — nav bars are the single biggest source of cross-page
near-duplicate shingles.

Scale shape: pure per-row computation inside an Arrow-batched
``mapInPandas`` kernel — no shuffle, no state; the classifier is a
free map over the fetched-page scan.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

from pyspark.sql import DataFrame

# tags that terminate a text block (HTML5 block-level + table cells)
BLOCK_TAGS = frozenset(
    "p div li ul ol dl dt dd h1 h2 h3 h4 h5 h6 td th tr table thead tbody "
    "article section header footer nav aside blockquote pre figure "
    "figcaption main form fieldset hr br".split()
)
_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})

LINK_DENSITY_MAX = 1 / 3   # jusText's max_link_density default
MIN_WORDS = 3              # shorter runs are headings/buttons, not prose


class _BlockParser(HTMLParser):
    """Stream HTML into (text, link_chars, total_chars) blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._buf: list[str] = []
        self._link_chars = 0
        self._total_chars = 0
        self._anchor_depth = 0
        self._skip_depth = 0

    def _flush(self) -> None:
        text = re.sub(r"\s+", " ", "".join(self._buf)).strip()
        if text:
            self.blocks.append({
                "text": text,
                "link_chars": self._link_chars,
                "total_chars": self._total_chars,
            })
        self._buf, self._link_chars, self._total_chars = [], 0, 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag == "a":
            self._anchor_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._skip_depth:
            return
        self._buf.append(data)
        n = len(data.strip()) or 0
        self._total_chars += n
        if self._anchor_depth:
            self._link_chars += n

    def close(self):
        super().close()
        self._flush()


def split_blocks(html: str) -> list[dict]:
    """HTML → block dicts with ``text``, ``link_chars``, ``total_chars``,
    ``link_density`` and ``n_words``."""
    p = _BlockParser()
    p.feed(html)
    p.close()
    for b in p.blocks:
        b["link_density"] = (b["link_chars"] / b["total_chars"]
                             if b["total_chars"] else 0.0)
        b["n_words"] = len(b["text"].split())
    return p.blocks


def extract_main_text(html: str, link_density_max: float = LINK_DENSITY_MAX,
                      min_words: int = MIN_WORDS) -> tuple[str, int, int]:
    """(main_text, n_blocks, n_content_blocks): content blocks joined
    with newlines; a block is content iff its link density is below the
    threshold AND it has at least ``min_words`` words."""
    blocks = split_blocks(html)
    content = [b for b in blocks
               if b["link_density"] <= link_density_max
               and b["n_words"] >= min_words]
    return "\n".join(b["text"] for b in content), len(blocks), len(content)


MAIN_CONTENT_SCHEMA = "id string, main_text string, n_blocks int, n_content int"


def extract_content(docs: DataFrame, html_col: str = "html",
                    id_col: str = "id",
                    link_density_max: float = LINK_DENSITY_MAX,
                    min_words: int = MIN_WORDS) -> DataFrame:
    """DataFrame form: (id, html) → (id, main_text, n_blocks,
    n_content). Arrow-batched, shuffle-free."""
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["id", "main_text", "n_blocks", "n_content"]
        for pdf in batches:
            out = {k: [] for k in cols}
            for rid, html in zip(pdf[id_col], pdf[html_col]):
                text, nb, nc = extract_main_text(
                    html, link_density_max, min_words)
                out["id"].append(rid)
                out["main_text"].append(text)
                out["n_blocks"].append(nb)
                out["n_content"].append(nc)
            yield pd.DataFrame(out, columns=cols)

    return docs.select(id_col, html_col).mapInPandas(kernel, MAIN_CONTENT_SCHEMA)
