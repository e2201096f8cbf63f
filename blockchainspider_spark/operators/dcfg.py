"""X4 — DCFG tracer round trip: request construction + response flatten.

The reference ships an embedded JS EVM step-tracer as a *fetch-request
parameter*: every `debug_traceTransaction` / `debug_traceBlockByNumber`
POST body carries `params: [<tx|block>, {"tracer": <js>}]`, and the
provider executes the tracer server-side, returning a dynamic-CFG
document `{blocks: [...], edges: [...]}` (reference
middlewares/trans/dcfg.py:12-145 for the tracer + :190-258 for the
request builders and parsers). In this engine:

* the tracer program is DATA — an opaque payload column on the request
  row. ``DCFG_TRACER_JS`` is a minimal original skeleton with the same
  collector interface (step/fault/result); the sandbox has no RPC, so
  only its structural position (inside ``params[1].tracer``) is
  load-bearing.
* request construction is a projection: filter `gas > 21000` (P8, the
  same pre-filter the trace middleware applies) → one JSON-RPC body per
  row via ``to_json`` over typed structs — no string templating in the
  hot path, and the body is parseable back by `get_json_object`.
* response flattening is relational: ``from_json`` with an explicit
  blocks/edges schema; edge endpoints resolve through ``element_at``
  into the blocks array (the reference's ``blocks[edge['from']]``
  lookup) — no UDF, no explode-join round trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Original minimal geth-style tracer skeleton (the reference's tracer
# additionally tracks jump/call context server-side — that logic runs on
# the PROVIDER, so the engine only needs the collector interface).
DCFG_TRACER_JS = (
    "{blocks: [], edges: [], "
    "step: function(log, db) {}, "
    "fault: function(log, db) {}, "
    "result: function(ctx, db) {"
    " return {blocks: this.blocks, edges: this.edges}; }}"
)

# opcode number → mnemonic for the opcodes the DCFG tracer emits as
# block operations / edge flow types (public EVM opcode table; the
# reference resolves these through pyevmasm and skips unknown numbers)
OPCODE_NAMES = {
    0x00: "STOP", 0x01: "ADD", 0x02: "MUL", 0x03: "SUB", 0x04: "DIV",
    0x10: "LT", 0x11: "GT", 0x14: "EQ", 0x15: "ISZERO", 0x16: "AND",
    0x34: "CALLVALUE", 0x35: "CALLDATALOAD", 0x50: "POP", 0x51: "MLOAD",
    0x52: "MSTORE", 0x54: "SLOAD", 0x55: "SSTORE", 0x56: "JUMP",
    0x57: "JUMPI", 0x5B: "JUMPDEST", 0x60: "PUSH1", 0x61: "PUSH2",
    0x80: "DUP1", 0x90: "SWAP1", 0xF0: "CREATE", 0xF1: "CALL",
    0xF2: "CALLCODE", 0xF3: "RETURN", 0xF4: "DELEGATECALL",
    0xF5: "CREATE2", 0xFA: "STATICCALL", 0xFD: "REVERT",
    0xFF: "SELFDESTRUCT",
}

_DCFG_RESULT_SCHEMA = (
    "struct<blocks: array<struct<contract_address string, start_pc long, "
    "operations array<int>>>, "
    "edges: array<struct<`from` int, `to` int, type int, value string, "
    "gas string, selector string, index int>>>"
)


def _opname_map():
    pairs = []
    for num, name in OPCODE_NAMES.items():
        pairs.extend([F.lit(num), F.lit(name)])
    return F.create_map(*pairs)


def dcfg_trace_requests(
    txs: DataFrame,
    tx_col: str = "hash",
    gas_col: str = "gas",
    gas_threshold: int = 21000,
    tracer_js: str = DCFG_TRACER_JS,
) -> DataFrame:
    """One `debug_traceTransaction` request row per traceable tx:
    (transaction_hash, method, body, priority). A bare value transfer
    (gas == 21000) runs no code, so the reference only traces
    `gas > 21000` (trace.py:49-50) — same predicate here, pushed to the
    scan."""
    # params is HETEROGENEOUS per the JSON-RPC debug_trace* spec
    # (reference trace.py:155: `params: [txhash, {tracer}]`) — a bare
    # string then an object — which to_json(struct) cannot express, so
    # the body is assembled from to_json pieces: the tracer object gets
    # real JSON escaping via to_json, the tx hash is a hex string
    # (quote-safe by construction) spliced in as the bare params[0]
    # (ADVICE r4: a real provider rejects `{"tx": hash}` there)
    tracer_obj = F.to_json(F.struct(F.lit(tracer_js).alias("tracer")))
    return (
        txs.where(F.col(gas_col).cast("long") > gas_threshold)
        .select(
            F.col(tx_col).alias("transaction_hash"),
            F.lit("POST").alias("method"),
            F.concat(
                F.lit('{"jsonrpc":"2.0","method":"debug_traceTransaction",'
                      '"params":["'),
                F.col(tx_col),
                F.lit('",'),
                tracer_obj,
                F.lit('],"id":1}'),
            ).alias("body"),
            (F.lit(0) - F.col(gas_col).cast("long")).alias("priority"),
        )
    )


def dcfg_block_requests(
    blocks: DataFrame,
    block_col: str = "block_number",
    tracer_js: str = DCFG_TRACER_JS,
) -> DataFrame:
    """`debug_traceBlockByNumber` form: params[0] is the hex block tag,
    priority 2^32 − block (ascending block order, reference
    blocks.py:134)."""
    tracer_obj = F.to_json(F.struct(F.lit(tracer_js).alias("tracer")))
    return blocks.select(
        F.col(block_col).cast("long").alias("block_number"),
        F.lit("POST").alias("method"),
        # params[0] is the BARE hex tag string (spec + ADVICE r4), the
        # tracer object follows with to_json escaping
        F.concat(
            F.lit('{"jsonrpc":"2.0","method":"debug_traceBlockByNumber",'
                  '"params":["0x'),
            F.lower(F.hex(F.col(block_col))),
            F.lit('",'),
            tracer_obj,
            F.lit('],"id":1}'),
        ).alias("body"),
        (F.lit(1 << 32) - F.col(block_col).cast("long")).alias("priority"),
    )


def flatten_dcfg_blocks(responses: DataFrame, tx_col: str = "transaction_hash",
                        json_col: str = "result_json") -> DataFrame:
    """DCFGBlockItem rows: (tx, contract_address, start_pc, operations)
    with opcode numbers resolved to mnemonics, unknown numbers dropped
    (the reference's `if NUM2OP_NAME.get(num)` guard)."""
    names = _opname_map()
    parsed = responses.select(
        F.col(tx_col).alias("transaction_hash"),
        F.from_json(F.col(json_col), _DCFG_RESULT_SCHEMA).alias("r"),
    )
    return parsed.select(
        "transaction_hash",
        F.explode("r.blocks").alias("b"),
    ).select(
        "transaction_hash",
        F.col("b.contract_address").alias("contract_address"),
        F.col("b.start_pc").alias("start_pc"),
        F.filter(
            F.transform(F.col("b.operations"), lambda n: names[n]),
            lambda x: x.isNotNull(),
        ).alias("operations"),
    )


def flatten_dcfg_edges(responses: DataFrame, tx_col: str = "transaction_hash",
                       json_col: str = "result_json") -> DataFrame:
    """DCFGEdgeItem rows: endpoints resolved through the blocks array
    (``element_at`` is 1-based; the tracer's edge indexes are 0-based),
    flow type resolved to its mnemonic, value/gas defaulting to −1 and
    selector to '0x' exactly like the reference parser."""
    names = _opname_map()
    parsed = responses.select(
        F.col(tx_col).alias("transaction_hash"),
        F.from_json(F.col(json_col), _DCFG_RESULT_SCHEMA).alias("r"),
    )
    blk = lambda idx: F.element_at(F.col("_blocks"), idx + 1)  # noqa: E731
    return parsed.select(
        "transaction_hash",
        F.explode("r.edges").alias("e"),
        F.col("r.blocks").alias("_blocks"),
    ).select(
        "transaction_hash",
        blk(F.col("e.from"))["contract_address"].alias("address_from"),
        blk(F.col("e.from"))["start_pc"].alias("start_pc_from"),
        blk(F.col("e.to"))["contract_address"].alias("address_to"),
        blk(F.col("e.to"))["start_pc"].alias("start_pc_to"),
        names[F.col("e.type")].alias("flow_type"),
        F.coalesce(F.col("e.value").cast("long"), F.lit(-1)).alias("value"),
        F.coalesce(F.col("e.gas").cast("long"), F.lit(-1)).alias("gas"),
        F.coalesce(F.col("e.selector"), F.lit("0x")).alias("selector"),
        F.coalesce(F.col("e.index"), F.lit(0)).alias("index"),
    )
