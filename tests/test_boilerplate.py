"""Boilerplate removal tests (functions/boilerplate.py)."""

from blockchainspider_spark.functions.boilerplate import (
    extract_main_text, split_blocks,
)

PAGE = """<html><head><title>t</title><style>p{color:red}</style>
<script>var nav = "<p>fake</p>";</script></head><body>
<div class="nav"><a href="/">home</a> <a href="/a">about us</a></div>
<p>The first real paragraph of prose content lives here.</p>
<p>And a second paragraph, also prose, with &amp; an entity.</p>
<div class="footer"><a href="/n">next page</a></div>
</body></html>"""


def test_nav_and_footer_dropped():
    text, n_blocks, n_content = extract_main_text(PAGE)
    assert n_content == 2
    assert text.splitlines() == [
        "The first real paragraph of prose content lives here.",
        "And a second paragraph, also prose, with & an entity.",
    ]


def test_script_and_style_skipped():
    blocks = split_blocks(PAGE)
    joined = " ".join(b["text"] for b in blocks)
    assert "fake" not in joined and "color" not in joined
    # the <p>fake</p> inside the script string must not open a block
    assert all("var nav" not in b["text"] for b in blocks)


def test_link_density():
    blocks = split_blocks('<div><a href="/">four</a> word runs here</div>')
    (b,) = blocks
    # 'four'=4 link chars, total 'four word runs here' = 4+4+4+4 stripped
    assert b["link_chars"] == 4
    assert b["link_density"] <= 1 / 3  # exactly at threshold → kept
    text, _, n_content = extract_main_text(
        '<div><a href="/">four</a> word runs here</div>')
    assert n_content == 1 and text == "four word runs here"


def test_min_words_drops_headings():
    html = "<h1>Short head</h1><p>long enough paragraph of words</p>"
    text, n_blocks, n_content = extract_main_text(html, min_words=3)
    assert n_blocks == 2 and n_content == 1
    assert text == "long enough paragraph of words"


def test_whitespace_collapse_and_nested_anchors():
    html = "<p>a   b\n\t c</p><p><a href='/'><span>all link text</span></a></p>"
    blocks = split_blocks(html)
    assert blocks[0]["text"] == "a b c"
    assert blocks[1]["link_density"] == 1.0


def test_spark_extract_content(spark):
    from blockchainspider_spark.functions.boilerplate import extract_content

    df = spark.createDataFrame([("d1", PAGE)], "id string, html string")
    (row,) = extract_content(df).collect()
    assert row["n_content"] == 2 and row["n_blocks"] >= 4
    assert row["main_text"].startswith("The first real paragraph")
