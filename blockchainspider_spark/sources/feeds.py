"""Label-feed sources (labels.* auxiliary scans, SURVEY S18/S19/S21).

One JSON/XML document in → many label rows out (UDTF shape). The
CryptoScamDB feed (S19) is schema'd ``from_json`` + nested explodes,
all JVM-side. The OFAC SDN XML scan (S18) has two paths: the real XML
kernel (``parse_ofac_xml`` — stdlib ``xml.etree`` inside mapInPandas,
matching the reference's XPath semantics, ofac.py:22-71) and the
JSON-form fallback (``parse_ofac_feed``) for pre-converted feeds."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCAMDB_SCHEMA = (
    "success boolean, result map<string, array<struct<"
    "name string, url string, category string, addresses array<string>"
    ">>>"
)


def parse_scamdb_feed(spark: SparkSession, docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """CryptoScamDB-shaped feed: {result: {domain: [entry...]}} → one row
    per (domain, entry, address) (reference cryptoscamdb.py:26-57)."""
    parsed = docs.select(F.from_json(F.col(json_col), SCAMDB_SCHEMA).alias("d"))
    entries = parsed.select(F.explode(F.col("d.result")).alias("domain", "entries"))
    entry = entries.select("domain", F.explode("entries").alias("e"))
    return entry.select(
        "domain",
        F.col("e.name").alias("name"),
        F.col("e.url").alias("url"),
        F.col("e.category").alias("category"),
        F.explode_outer("e.addresses").alias("address"),
    )


OFAC_JSON_SCHEMA = (
    "sdnEntries array<struct<uid string, firstName string, lastName string, "
    "programs array<string>, digitalCurrencyAddresses array<struct<"
    "currency string, address string>>>>"
)


def parse_ofac_feed(spark: SparkSession, docs: DataFrame, json_col: str = "doc") -> DataFrame:
    """OFAC SDN (pre-parsed JSON form of the XML): one row per
    (entry, digital-currency address) (reference ofac.py:22-71).
    The XML→JSON conversion itself requires spark-xml / lxml, neither
    bundled here — callers must supply the JSON form."""
    parsed = docs.select(F.from_json(F.col(json_col), OFAC_JSON_SCHEMA).alias("d"))
    entry = parsed.select(F.explode("d.sdnEntries").alias("e"))
    return entry.select(
        F.col("e.uid").alias("uid"),
        F.concat_ws(" ", "e.firstName", "e.lastName").alias("entity_name"),
        F.array_join("e.programs", ",").alias("programs"),
        F.explode("e.digitalCurrencyAddresses").alias("dca"),
    ).select("uid", "entity_name", "programs",
             F.col("dca.currency").alias("currency"),
             F.col("dca.address").alias("address"))


OFAC_XML_OUT_SCHEMA = (
    "uid string, first_name string, last_name string, sdn_type string, "
    "net string, address string"
)


def _parse_sdn_entries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched SDN XML kernel: stdlib ElementTree with namespace
    wildcards, mirroring the reference's XPath walk (ofac.py:28-71):
    keep only entries holding a 'Digital Currency Address -*' id, emit
    one row per such id, map the XBT net to BTC."""
    import xml.etree.ElementTree as ET

    def text(el, name):
        c = el.find(f"{{*}}{name}")
        return c.text if c is not None else None

    for pdf in batches:
        out = {k: [] for k in ("uid", "first_name", "last_name", "sdn_type", "net", "address")}
        for xml in pdf.iloc[:, 0]:
            if not xml:
                continue
            root = ET.fromstring(xml)
            entries = root.findall(".//{*}sdnEntry")
            if not entries and root.tag.rsplit("}", 1)[-1] == "sdnEntry":
                entries = [root]
            for entry in entries:
                dca = []
                for _id in entry.findall("{*}idList/{*}id"):
                    id_type = text(_id, "idType") or ""
                    if "Digital Currency Address" in id_type:
                        net = id_type.replace("Digital Currency Address -", "").strip()
                        dca.append(("BTC" if net == "XBT" else net, text(_id, "idNumber")))
                if not dca:  # reference _has_address guard
                    continue
                for net, addr in dca:
                    out["uid"].append(text(entry, "uid"))
                    out["first_name"].append(text(entry, "firstName"))
                    out["last_name"].append(text(entry, "lastName"))
                    out["sdn_type"].append(text(entry, "sdnType"))
                    out["net"].append(net)
                    out["address"].append(addr)
        yield pd.DataFrame(out)


def parse_ofac_xml(docs: DataFrame, xml_col: str = "doc") -> DataFrame:
    """S18, real XML path: one SDN XML document per row → one row per
    (sanctioned entry, digital-currency address)."""
    return docs.select(xml_col).mapInPandas(_parse_sdn_entries, OFAC_XML_OUT_SCHEMA)


SITEMAP_OUT_SCHEMA = (
    "source string, kind string, url string, lastmod string, priority double"
)
_SITEMAP_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def parse_sitemap_text(source: str, xml_text: str) -> list[dict]:
    """One sitemap document → frontier rows (pure core, oracle-shared).

    Handles both grammars of the sitemaps.org 0.9 protocol: <urlset>
    rows come out kind='url' with optional lastmod/priority; a
    <sitemapindex> yields kind='sitemap' rows (nested sitemap locs) the
    crawler enqueues for the next fetch wave instead of emitting as
    page URLs. Namespaced and namespace-less documents both parse
    (plenty of real sitemaps omit xmlns)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml_text)
    tag = root.tag.removeprefix(_SITEMAP_NS)
    ns = _SITEMAP_NS if root.tag.startswith(_SITEMAP_NS) else ""

    def text(el, name):
        node = el.find(f"{ns}{name}")
        return node.text.strip() if node is not None and node.text else None

    rows: list[dict] = []
    if tag == "urlset":
        for u in root.iter(f"{ns}url"):
            loc = text(u, "loc")
            if not loc:
                continue
            pr = text(u, "priority")
            rows.append({
                "source": source, "kind": "url", "url": loc,
                "lastmod": text(u, "lastmod"),
                "priority": float(pr) if pr is not None else None,
            })
    elif tag == "sitemapindex":
        for s in root.iter(f"{ns}sitemap"):
            loc = text(s, "loc")
            if not loc:
                continue
            rows.append({
                "source": source, "kind": "sitemap", "url": loc,
                "lastmod": text(s, "lastmod"), "priority": None,
            })
    else:
        raise ValueError(f"not a sitemap document: root <{root.tag}>")
    return rows


def parse_sitemaps(docs: DataFrame, xml_col: str = "xml",
                   source_col: str = "source") -> DataFrame:
    """Sitemap ingestion for the crawl frontier: (source, xml) documents
    → (kind='url' | kind='sitemap') rows. Arrow-batched ElementTree
    kernel, one pass per document; the nested-index rows feed the next
    fetch wave (the engine treats them like redirects, not pages)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["source", "kind", "url", "lastmod", "priority"]
        for pdf in batches:
            rows: list[dict] = []
            for src, xml_text in zip(pdf[source_col], pdf[xml_col]):
                rows.extend(parse_sitemap_text(src, xml_text))
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(source_col, xml_col).mapInPandas(kernel, SITEMAP_OUT_SCHEMA)
