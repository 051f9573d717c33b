"""HTTP query server speaking the reference's wire protocol.

The reference is client/server: the Python client serializes each
operation as JSON, POSTs to ``/call``, and holds the returned plan
opaquely between calls (reference ``client.py:194-246``,
``src/api.rs:39-168``). This server implements the same protocol over
the PySpark engine, so a user of the reference's client can point it at
this engine unchanged:

- request: ``{"dataframe": <plan|null>, "function": F}`` with ``F`` one
  of ``{"Read": [format, path, schema]}``, ``{"Op": {...}}``,
  ``{"Action": "Collect" | "Count" | {"Take": n}}``.
- response: ``{"dataframe": <plan>, "blocks": {col: {"Int": [...]}}}``
  (externally-tagged block vectors like the reference's ``AnyBlock`` —
  ``src/block.rs:110-119``).
- ops: ``Select`` (ColumnExpr trees: Constant/Source/Alias/Operation),
  ``Filter`` (comparator + typed value), ``OrderBy``, ``GroupBy``,
  ``Aggregation``, ``Join`` (the right side arrives as a nested plan —
  "the whole lineage tree is the wire format").

The plan this server returns is its own opaque op list (the client
round-trips it verbatim, exactly as with the reference server). Plans
are replayed through the fluent ``Df`` on action, so the PlanCache's
content-addressed fingerprints give reference-style cross-request
memoization for free. ``Count``/``Take`` are implemented (the reference
declares them but panics — ``src/api.rs:78``).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .expr import Aggregator, Comparator, Expr, Predicate, Value, c, v
from .frame import Df
from .plans.cache import PlanCache

_TYPE_MAP = {
    "Bool": T.BooleanType(),
    "Int": T.LongType(),
    "Float": T.DoubleType(),
    "String": T.StringType(),
}

_AGG_MAP = {
    "Average": Aggregator.AVERAGE,
    "Count": Aggregator.COUNT,
    "First": Aggregator.FIRST,
    "Max": Aggregator.MAX,
    "Min": Aggregator.MIN,
    "Sum": Aggregator.SUM,
}

_CMP_MAP = {
    "Equal": Comparator.EQUAL,
    "GreaterThan": Comparator.GREATER_THAN,
    "GreaterThanOrEq": Comparator.GREATER_THAN_OR_EQ,
    "LessThan": Comparator.LESS_THAN,
    "LessThanOrEq": Comparator.LESS_THAN_OR_EQ,
}


def _parse_value(obj: Any) -> Value:
    """Reference ``Value`` serialization: ``{"Int": 5}``, ``{"Bool":
    true}``, ``{"String": "x"}``, ``{"Float": {"value": 1.5, "phantom":
    null}}`` (client.py:55-69)."""
    if not isinstance(obj, dict) or len(obj) != 1:
        raise ValueError(f"bad value: {obj!r}")
    (kind, val), = obj.items()
    if kind == "Float" and isinstance(val, dict):
        val = val["value"]
    if kind == "Int":
        val = int(val)
    return Value(val)


def _parse_expr(obj: Any) -> Expr:
    """Reference ``ColumnExpr`` serialization (client.py:119-186)."""
    (kind, args), = obj.items()
    if kind == "Source":
        return c(args)
    if kind == "Constant":
        return v(_parse_value(args).val)
    if kind == "Alias":
        name, child = args
        return _parse_expr(child).alias(name)
    if kind == "Operation":
        op, left, right = args
        le, re_ = _parse_expr(left), _parse_expr(right)
        if op == "Add":
            return le + re_
        if op == "Subtract":
            return le - re_
        if op == "Multiply":
            return le * re_
        if op == "Divide":
            return le / re_
    raise ValueError(f"bad column expr: {obj!r}")


def _parse_schema(obj: dict) -> T.StructType:
    return T.StructType(
        [T.StructField(col["name"], _TYPE_MAP[col["type_"]]) for col in obj["columns"]]
    )


class Engine:
    """Replays wire plans through the fluent Df; caches by fingerprint."""

    def __init__(self, spark: SparkSession, cache_capacity: int = 32) -> None:
        self.spark = spark
        self.cache = PlanCache(capacity=cache_capacity)

    def build(self, plan: list[dict]) -> Df:
        df: Df | None = None
        for op in plan:
            (name, args), = op.items()
            if name == "Read":
                fmt, path, schema = args
                if fmt == "csv":
                    df = Df.from_csv(self.spark, path, _parse_schema(schema))
                elif fmt == "parquet":  # extension beyond the reference
                    df = Df.from_parquet(self.spark, path)
                else:
                    raise ValueError(f"unknown format {fmt!r}")
                continue
            if df is None:
                raise ValueError("plan has no Read source")
            if name == "Select":
                df = df.select(*[_parse_expr(e) for e in args])
            elif name == "Filter":
                col, pred = args
                df = df.filter(col, Predicate(_CMP_MAP[pred["comparator"]],
                                              _parse_value(pred["value"])))
            elif name == "OrderBy":
                df = df.order_by(*args)
            elif name == "GroupBy":
                df = df.group_by(*args)
            elif name == "Aggregation":
                df = df.aggregate({col: _AGG_MAP[a] for col, a in args.items()})
            elif name == "Join":
                right_plan, lcol, rcol = args
                df = df.join(self.build(right_plan), lcol, rcol)
            else:
                raise ValueError(f"unknown op {name!r}")
        if df is None:
            raise ValueError("empty plan")
        return df

    def blocks(self, df: Df) -> dict[str, dict[str, list]]:
        """Columnar result in the reference's externally-tagged AnyBlock
        form (src/block.rs:110-119)."""
        sdf = df.to_spark()
        cols = df.collect_columns()
        out = {}
        for field in sdf.schema.fields:
            vals = cols[field.name]
            out[field.name] = {_block_tag(field.dataType): vals}
        return out


def _block_tag(dt: T.DataType) -> str:
    if isinstance(dt, T.ArrayType):
        return _block_tag(dt.elementType) + "List"
    if isinstance(dt, T.BooleanType):
        return "Bool"
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType)):
        return "Int"
    if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
        return "Float"
    return "String"


def make_handler(engine: Engine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # noqa: D102 — quiet server
            pass

        def do_GET(self):  # noqa: N802 — http.server API
            """Pool introspection (reference ``pool.size()`` /
            ``print_indices`` — src/pool.rs:49-51)."""
            if self.path != "/pool":
                self.send_error(404)
                return
            payload = json.dumps(
                {
                    "size": len(engine.cache),
                    "hits": engine.cache.hits,
                    "misses": engine.cache.misses,
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(payload)

        def do_POST(self):  # noqa: N802 — http.server API
            if self.path != "/call":
                self.send_error(404)
                return
            try:
                length = int(self.headers["Content-Length"])
                body = json.loads(self.rfile.read(length))
                plan = body.get("dataframe") or []
                fn = body["function"]
                blocks: dict = {}
                if "Read" in fn:
                    plan = [{"Read": fn["Read"]}]
                elif "Op" in fn:
                    self_check = engine.build(plan + [fn["Op"]])  # eager validation
                    _ = self_check  # build errors surface as 400s
                    plan = plan + [fn["Op"]]
                elif "Action" in fn:
                    action = fn["Action"]
                    # content-addressed memoization (reference Pool,
                    # src/pool.rs:25-94): a re-submitted plan — even
                    # rebuilt from scratch by a new client — hits the
                    # persisted frame instead of recomputing
                    df = engine.cache.get(engine.build(plan))
                    if action == "Collect":
                        blocks = engine.blocks(df)
                    elif action == "Count":
                        blocks = {"count": {"Int": [df.count()]}}
                    elif isinstance(action, dict) and "Take" in action:
                        blocks = engine.blocks(df.limit(int(action["Take"])))
                    else:
                        raise ValueError(f"unknown action {action!r}")
                else:
                    raise ValueError(f"unknown function {fn!r}")
                payload = json.dumps({"dataframe": plan, "blocks": blocks})
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(payload.encode())
            except Exception as e:  # noqa: BLE001 — wire boundary
                msg = json.dumps({"error": str(e)}).encode()
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(msg)

    return Handler


def start_server(spark: SparkSession, port: int = 3000) -> ThreadingHTTPServer:
    """Start the server on a daemon thread; returns the server object
    (call ``.shutdown()`` to stop)."""
    engine = Engine(spark)
    httpd = ThreadingHTTPServer(("127.0.0.1", port), make_handler(engine))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd
