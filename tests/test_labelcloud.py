"""S20 label-cloud scan over the deterministic render double.

The Selenium hop itself is environment-gated (render_page raises); the
three parsing/pagination stages run end-to-end over canned rendered
HTML, matching the reference spider's extraction grammar
(labelcloud.py: dropdown anchors → tab/size pagination → table rows)."""

import json

import pytest

from blockchainspider_spark.sources.labelcloud import (
    FakeRenderer,
    crawl_labelcloud,
    render_page,
)

ROOT = "https://etherscan.example/labelcloud"

CLOUD_HTML = """
<html><body>
<div class="dropdown-menu other">
  <a href="/accounts/label/exchange">Exchange Accounts (230)</a>
  <a href="/accounts/label/phish-hack">Phish Accounts (120)</a>
  <a href="/txs/label/exploit">Exploit transactions (7)</a>
  <a href="/junk/label/none">Unrelated (999)</a>
</div>
</body></html>
"""

# exchange: tabbed navigation (two subcats, totals 150 and 30)
NAV_EXCHANGE = """
<html><h1><span>Exchange</span></h1>
<div class="card-header">
<ul>
 <li><a val="1" href="#">Main (150)</a></li>
 <li><a val="7" href="#">Legacy (30)</a></li>
</ul>
</div>
</html>
"""

# phish-hack: no tabs → single size/start ladder from the cloud size (120)
NAV_PHISH = "<html><h1><span>Phish/Hack</span></h1><p>no tabs</p></html>"


def table_page(rows):
    body = "".join(
        f"<tr><td>{a}</td><td>{n}</td></tr>" for a, n in rows
    )
    return (
        "<html><table><thead><tr><th>Address</th><th>Name Tag</th></tr></thead>"
        f"<tbody>{body}</tbody></table></html>"
    )


@pytest.fixture(scope="module")
def renderer():
    pages = {
        ROOT: CLOUD_HTML,
        "https://etherscan.example/accounts/label/exchange": NAV_EXCHANGE,
        "https://etherscan.example/accounts/label/phish-hack": NAV_PHISH,
    }
    # exchange tab 1: totals 150 → starts 0/100; tab 7: total 30 → start 0
    pages["https://etherscan.example/accounts/label/exchange?subcatid=1&size=100&start=0"] = \
        table_page([("0xaaa1", "Binance 1"), ("0xaaa2", "Binance 2")])
    pages["https://etherscan.example/accounts/label/exchange?subcatid=1&size=100&start=100"] = \
        table_page([("0xaaa3", "Binance 3")])
    pages["https://etherscan.example/accounts/label/exchange?subcatid=7&size=100&start=0"] = \
        table_page([("0xbbb1", "OldEx")])
    # phish: total 120 → starts 0/100
    pages["https://etherscan.example/accounts/label/phish-hack?size=100&start=0"] = \
        table_page([("0xccc1", "Fake Uni")])
    pages["https://etherscan.example/accounts/label/phish-hack?size=100&start=100"] = \
        table_page([("0xccc2", "Fake Sushi")])
    return FakeRenderer(pages)


def test_render_hop_is_gated():
    with pytest.raises(NotImplementedError):
        render_page("https://etherscan.io/labelcloud")


def test_end_to_end_label_reports(spark, renderer):
    out = crawl_labelcloud(spark, renderer, site="etherscan",
                           categories=("accounts",), page_size=100).collect()
    by_addr = {r.address: r for r in out}
    # 4 exchange rows (2 tabs, 3 pages) + 2 phish rows; the unrelated
    # category and the transactions anchor are filtered out
    assert sorted(by_addr) == ["0xaaa1", "0xaaa2", "0xaaa3", "0xbbb1", "0xccc1", "0xccc2"]
    assert by_addr["0xaaa1"].label == "Exchange"
    assert by_addr["0xccc2"].label == "Phish/Hack"
    assert all(r.net == "eth" and r.reporter == "etherscan" for r in out)
    # description carries the full row dict, reference-style
    desc = json.loads(by_addr["0xaaa3"].description)
    assert desc["NameTag"] == "Binance 3"
    assert desc["Address"] == "0xaaa3"
    assert "start=100" in desc["url"]


def test_transactions_category_extracts_tx_hashes(spark, renderer):
    from blockchainspider_spark.sources.labelcloud import parse_label_rows

    tx_html = (
        "<html><table><thead><tr><th>Txn Hash</th><th>Note</th></tr></thead>"
        "<tbody><tr><td>0xdead</td><td>rugpull</td></tr></tbody></table></html>"
    )
    pages = spark.createDataFrame(
        [("u1", tx_html, "Exploit")], "url string, html string, label string"
    )
    [row] = parse_label_rows(pages, category="transactions").collect()
    assert row.transaction_hash == "0xdead"
    assert row.address is None
