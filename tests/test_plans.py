"""Physical-plan regression hook: the full explain audit must stay green
(tools/explain_audit.py doubles as this test's engine — 25 assertions on
pushdown, broadcast, partial aggs, seq-assignment paths, top-k pops,
redirect chip merge, UDF-closure ANN signatures, hub netting, duplicate
spans, the cuckoo probe, the pHash/dedup-group stages, the round-6
zero-shuffle projections/packing, and the streaming-dedup stateful
exchange, the robots first-match broadcast gate, the revalidation
cache upsert, and the zero-Python crawler-trap scorer. The count pin catches accidentally-dropped sections — bump it
when adding one)."""

from tools.explain_audit import audit


def test_plan_audit_all_ok(spark):
    results = audit(spark, "/root/testdata/sf0.001")
    failed = [name for name, _, _, ok in results if not ok]
    assert not failed, failed
    assert len(results) == 25
