"""Label-feed sources (labels.* auxiliary scans, SURVEY S18/S19/S21).

One JSON/XML document in → many label rows out (UDTF shape): schema'd
``from_json`` + nested explodes, all JVM-side. The CryptoScamDB feed
(S19) is fully implemented; the OFAC SDN XML scan (S18) parses with the
same explode pattern from a pre-parsed JSON form (spark-xml is not
bundled in this container — the XML→JSON step is gated)."""

from __future__ import annotations

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
