"""Expression surface of the engine.

Mirrors the reference client's expression language (reference
``client.py:53-191``: ``c()``, ``Value``, ``ColumnExpr`` with
``+ - * /`` overloads and ``.alias()``, ``Predicate``/``Comparator``,
``Aggregator``) and the server-side semantics (reference
``src/dataframe.rs:105-111``, ``src/block.rs:81-107``,
``src/value.rs:214-245``, ``src/aggregate.rs:27-107``).

Expressions are a tiny AST compiled to ``pyspark.sql.Column`` against a
known input schema, so the engine can enforce the reference's build-time
validation rules (alias required on computed columns, unknown-column
errors, aggregator/type compatibility) before Catalyst ever sees the
plan — while the *execution* is 100% JVM-side Catalyst expressions.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Any, Union

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


class EngineError(ValueError):
    """Validation error raised at plan-build time (reference errors at
    e.g. ``src/dataframe.rs:317-318`` / ``:407-424``)."""


# ---------------------------------------------------------------------------
# Values / literals
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Value:
    """Typed literal (reference ``src/value.rs:92-102``; client ``Value``)."""

    val: Any

    def spark_type(self) -> T.DataType:
        return _python_to_spark_type(self.val)

    def to_column(self) -> Column:
        return F.lit(self.val)


def _python_to_spark_type(val: Any) -> T.DataType:
    if isinstance(val, bool):
        return T.BooleanType()
    if isinstance(val, int):
        return T.LongType()
    if isinstance(val, float):
        return T.DoubleType()
    if isinstance(val, str):
        return T.StringType()
    raise EngineError(f"unsupported literal type: {type(val).__name__}")


# ---------------------------------------------------------------------------
# Comparators / predicates (reference src/value.rs:214-245)
# ---------------------------------------------------------------------------


class Comparator(enum.Enum):
    EQUAL = "=="
    GREATER_THAN = ">"
    GREATER_THAN_OR_EQ = ">="
    LESS_THAN = "<"
    LESS_THAN_OR_EQ = "<="

    def apply(self, col: Column, lit: Column) -> Column:
        if self is Comparator.EQUAL:
            return col == lit
        if self is Comparator.GREATER_THAN:
            return col > lit
        if self is Comparator.GREATER_THAN_OR_EQ:
            return col >= lit
        if self is Comparator.LESS_THAN:
            return col < lit
        return col <= lit


@dataclass(frozen=True)
class Predicate:
    """``col <cmp> literal`` predicate (reference ``Predicate``,
    ``src/value.rs:235-245``). Null comparisons are false → the row is
    dropped, matching the reference's NaN-comparison behavior
    (``src/value.rs:223-233``)."""

    comparator: Comparator
    value: Value

    def apply(self, col: Column) -> Column:
        return self.comparator.apply(col, self.value.to_column())

    # convenience constructors -------------------------------------------------
    @staticmethod
    def eq(val: Any) -> "Predicate":
        return Predicate(Comparator.EQUAL, Value(val))

    @staticmethod
    def gt(val: Any) -> "Predicate":
        return Predicate(Comparator.GREATER_THAN, Value(val))

    @staticmethod
    def gte(val: Any) -> "Predicate":
        return Predicate(Comparator.GREATER_THAN_OR_EQ, Value(val))

    @staticmethod
    def lt(val: Any) -> "Predicate":
        return Predicate(Comparator.LESS_THAN, Value(val))

    @staticmethod
    def lte(val: Any) -> "Predicate":
        return Predicate(Comparator.LESS_THAN_OR_EQ, Value(val))


# ---------------------------------------------------------------------------
# Aggregators (reference src/aggregate.rs:27-107)
# ---------------------------------------------------------------------------

_NUMERIC = (T.LongType, T.IntegerType, T.DoubleType, T.FloatType, T.ShortType, T.ByteType, T.DecimalType)


class Aggregator(enum.Enum):
    AVERAGE = "avg"
    COUNT = "count"
    FIRST = "first"
    MAX = "max"
    MIN = "min"
    SUM = "sum"

    def output_type(self, input_type: T.DataType) -> T.DataType:
        """Typing rules per reference ``src/aggregate.rs:83-107``:
        Average→Float (numeric only), Count→Int (any), Sum→input type
        (numeric only), First/Max/Min→input type; Max/Min invalid on
        Bool."""
        inner = input_type.elementType if isinstance(input_type, T.ArrayType) else input_type
        if self is Aggregator.COUNT:
            return T.LongType()
        if self is Aggregator.AVERAGE:
            if not isinstance(inner, _NUMERIC):
                raise EngineError(f"cannot average non-numeric type {inner.simpleString()}")
            return T.DoubleType()
        if self is Aggregator.SUM:
            if not isinstance(inner, _NUMERIC):
                raise EngineError(f"cannot sum non-numeric type {inner.simpleString()}")
            return inner
        if self in (Aggregator.MAX, Aggregator.MIN) and isinstance(inner, T.BooleanType):
            raise EngineError(f"cannot {self.name.lower()} boolean column")
        return inner

    def apply(self, col: Column) -> Column:
        fn = {
            Aggregator.AVERAGE: F.avg,
            Aggregator.COUNT: F.count,
            Aggregator.FIRST: lambda c: F.first(c, ignorenulls=False),
            Aggregator.MAX: F.max,
            Aggregator.MIN: F.min,
            Aggregator.SUM: F.sum,
        }[self]
        return fn(col)

    def apply_to_list(self, col: Column) -> Column:
        """Aggregate an ``array<T>`` column element-wise (the reference's
        grouped-frame path, ``src/block.rs:1084-1093``): List columns
        produced by ``group_by`` collapse to one value per row. Stays
        JVM-side via codegen'd array builtins; SUM/AVERAGE are handled by
        the caller (frame._apply_to_list / _collapse_agg) because they
        need the element type — no interpreted higher-order lambdas here."""
        if self is Aggregator.COUNT:
            return F.size(col)
        if self is Aggregator.FIRST:
            return F.element_at(col, 1)
        if self is Aggregator.MAX:
            return F.array_max(col)
        if self is Aggregator.MIN:
            return F.array_min(col)
        raise EngineError(
            f"{self.name} over a list column needs the element type — "
            "use frame._apply_to_list, not Aggregator.apply_to_list"
        )


# ---------------------------------------------------------------------------
# Column expressions (reference src/dataframe.rs:105-111, client.py:135-191)
# ---------------------------------------------------------------------------


class ArithmeticOp(enum.Enum):
    ADD = "+"
    SUB = "-"
    MUL = "*"
    DIV = "/"


Operand = Union["Expr", Value, int, float, bool, str]


class Expr:
    """Expression AST node. Build with :func:`c` / :func:`v`, combine
    with ``+ - * /``, name with ``.alias()``."""

    def __add__(self, other: Operand) -> "Expr":
        return BinOp(ArithmeticOp.ADD, self, _wrap(other))

    def __radd__(self, other: Operand) -> "Expr":
        return BinOp(ArithmeticOp.ADD, _wrap(other), self)

    def __sub__(self, other: Operand) -> "Expr":
        return BinOp(ArithmeticOp.SUB, self, _wrap(other))

    def __rsub__(self, other: Operand) -> "Expr":
        return BinOp(ArithmeticOp.SUB, _wrap(other), self)

    def __mul__(self, other: Operand) -> "Expr":
        return BinOp(ArithmeticOp.MUL, self, _wrap(other))

    def __rmul__(self, other: Operand) -> "Expr":
        return BinOp(ArithmeticOp.MUL, _wrap(other), self)

    def __truediv__(self, other: Operand) -> "Expr":
        return BinOp(ArithmeticOp.DIV, self, _wrap(other))

    def __rtruediv__(self, other: Operand) -> "Expr":
        return BinOp(ArithmeticOp.DIV, _wrap(other), self)

    # comparison / boolean operators (extension beyond the reference's
    # single-column-vs-literal predicates — compound conditions are free
    # in Spark)
    def __eq__(self, other: object) -> "Expr":  # type: ignore[override]
        return Cmp(Comparator.EQUAL, self, _wrap(other))

    def __ne__(self, other: object) -> "Expr":  # type: ignore[override]
        return BoolNot(Cmp(Comparator.EQUAL, self, _wrap(other)))

    def __gt__(self, other: Operand) -> "Expr":
        return Cmp(Comparator.GREATER_THAN, self, _wrap(other))

    def __ge__(self, other: Operand) -> "Expr":
        return Cmp(Comparator.GREATER_THAN_OR_EQ, self, _wrap(other))

    def __lt__(self, other: Operand) -> "Expr":
        return Cmp(Comparator.LESS_THAN, self, _wrap(other))

    def __le__(self, other: Operand) -> "Expr":
        return Cmp(Comparator.LESS_THAN_OR_EQ, self, _wrap(other))

    def __and__(self, other: "Expr") -> "Expr":
        return BoolAnd(self, _wrap(other))

    def __or__(self, other: "Expr") -> "Expr":
        return BoolOr(self, _wrap(other))

    def __invert__(self) -> "Expr":
        return BoolNot(self)

    def __hash__(self) -> int:
        return id(self)

    def alias(self, name: str) -> "Expr":
        return Alias(name, self)

    # to be implemented by subclasses ----------------------------------------
    def output_name(self) -> str | None:
        """The column name this expression carries, or None if unnamed
        (unnamed computed columns are a build-time error — reference
        ``src/dataframe.rs:317-318``)."""
        raise NotImplementedError

    def compile(self, schema: T.StructType) -> Column:
        raise NotImplementedError

    def output_type(self, schema: T.StructType) -> T.DataType:
        raise NotImplementedError


def _wrap(operand: Operand) -> Expr:
    if isinstance(operand, Expr):
        return operand
    if isinstance(operand, Value):
        return Constant(operand)
    return Constant(Value(operand))


@dataclass(frozen=True, eq=False)
class Constant(Expr):
    value: Value

    def output_name(self) -> str | None:
        return None

    def compile(self, schema: T.StructType) -> Column:
        return self.value.to_column()

    def output_type(self, schema: T.StructType) -> T.DataType:
        return self.value.spark_type()

    def __repr__(self) -> str:
        return f"lit({self.value.val!r})"


@dataclass(frozen=True, eq=False)
class Source(Expr):
    name: str

    def output_name(self) -> str | None:
        return self.name

    def compile(self, schema: T.StructType) -> Column:
        _require_column(schema, self.name)
        return F.col(self.name)

    def output_type(self, schema: T.StructType) -> T.DataType:
        return _require_column(schema, self.name).dataType

    def __repr__(self) -> str:
        return f"c({self.name!r})"


@dataclass(frozen=True, eq=False)
class Alias(Expr):
    name: str
    child: Expr

    def output_name(self) -> str | None:
        return self.name

    def compile(self, schema: T.StructType) -> Column:
        return self.child.compile(schema).alias(self.name)

    def output_type(self, schema: T.StructType) -> T.DataType:
        return self.child.output_type(schema)

    def __repr__(self) -> str:
        return f"{self.child!r}.alias({self.name!r})"


@dataclass(frozen=True, eq=False)
class BinOp(Expr):
    op: ArithmeticOp
    left: Expr
    right: Expr

    def output_name(self) -> str | None:
        return None

    def compile(self, schema: T.StructType) -> Column:
        self.output_type(schema)  # validate operand types
        lc, rc = self.left.compile(schema), self.right.compile(schema)
        if self.op is ArithmeticOp.ADD:
            return lc + rc
        if self.op is ArithmeticOp.SUB:
            return lc - rc
        if self.op is ArithmeticOp.MUL:
            return lc * rc
        # Spark's `/` already yields double for Int/Int, matching the
        # reference's Divide→Float rule (src/block.rs:496-501).
        return lc / rc

    def output_type(self, schema: T.StructType) -> T.DataType:
        lt = self.left.output_type(schema)
        rt = self.right.output_type(schema)
        for t in (lt, rt):
            if not isinstance(t, _NUMERIC):
                raise EngineError(
                    f"arithmetic on non-numeric type {t.simpleString()} in {self!r}"
                )
        if self.op is ArithmeticOp.DIV:
            return T.DoubleType()
        if isinstance(lt, (T.DoubleType, T.FloatType)) or isinstance(rt, (T.DoubleType, T.FloatType)):
            return T.DoubleType()
        return T.LongType()

    def __repr__(self) -> str:
        return f"({self.left!r} {self.op.value} {self.right!r})"


@dataclass(frozen=True, eq=False)
class Cmp(Expr):
    """Boolean comparison expression (extension: col-vs-col and
    compound predicates; the reference only supports
    single-column-vs-literal in ``filter``)."""

    comparator: Comparator
    left: Expr
    right: Expr

    def output_name(self) -> str | None:
        return None

    def compile(self, schema: T.StructType) -> Column:
        return self.comparator.apply(self.left.compile(schema), self.right.compile(schema))

    def output_type(self, schema: T.StructType) -> T.DataType:
        return T.BooleanType()

    def __repr__(self) -> str:
        return f"({self.left!r} {self.comparator.value} {self.right!r})"


@dataclass(frozen=True, eq=False)
class BoolAnd(Expr):
    left: Expr
    right: Expr

    def output_name(self) -> str | None:
        return None

    def compile(self, schema: T.StructType) -> Column:
        return self.left.compile(schema) & self.right.compile(schema)

    def output_type(self, schema: T.StructType) -> T.DataType:
        return T.BooleanType()

    def __repr__(self) -> str:
        return f"({self.left!r} & {self.right!r})"


@dataclass(frozen=True, eq=False)
class BoolOr(Expr):
    left: Expr
    right: Expr

    def output_name(self) -> str | None:
        return None

    def compile(self, schema: T.StructType) -> Column:
        return self.left.compile(schema) | self.right.compile(schema)

    def output_type(self, schema: T.StructType) -> T.DataType:
        return T.BooleanType()

    def __repr__(self) -> str:
        return f"({self.left!r} | {self.right!r})"


@dataclass(frozen=True, eq=False)
class BoolNot(Expr):
    child: Expr

    def output_name(self) -> str | None:
        return None

    def compile(self, schema: T.StructType) -> Column:
        return ~self.child.compile(schema)

    def output_type(self, schema: T.StructType) -> T.DataType:
        return T.BooleanType()

    def __repr__(self) -> str:
        return f"~({self.child!r})"


@dataclass(frozen=True, eq=False)
class Raw(Expr):
    """Escape hatch: wrap an arbitrary ``pyspark.sql.Column`` (extension
    beyond the reference surface — string/date/array functions etc.).
    Must be aliased before use in ``select``."""

    column: Column
    typ: T.DataType | None = None

    def output_name(self) -> str | None:
        return None

    def compile(self, schema: T.StructType) -> Column:
        return self.column

    def output_type(self, schema: T.StructType) -> T.DataType:
        return self.typ if self.typ is not None else T.NullType()

    def __repr__(self) -> str:
        return f"raw({self.column!r})"


def c(name_or_value: str | Value) -> Expr:
    """Column reference (or constant when given a :class:`Value`) —
    mirrors the reference client's ``c()`` (``client.py:188-191``)."""
    if isinstance(name_or_value, Value):
        return Constant(name_or_value)
    return Source(name_or_value)


def v(val: Any) -> Expr:
    """Literal expression shorthand."""
    return Constant(Value(val))


def raw(column: Column, typ: T.DataType | None = None) -> Expr:
    return Raw(column, typ)


def _require_column(schema: T.StructType, name: str) -> T.StructField:
    for field in schema.fields:
        if field.name == name:
            return field
    raise EngineError(
        f"unknown column {name!r}; available: {[f.name for f in schema.fields]}"
    )
