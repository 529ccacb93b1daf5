"""View algebra — the one piece of hiero architecture worth keeping.

hiero never copies data on filter: a view is the base table plus an
`IMembershipSet` of visible rows (`table/api/IMembershipSet.java`,
`table/membership/{Full,Dense,Sparse}MembershipSet.java` — SURVEY.md §1.1).
Views combine with Union / Intersection / Exclude / Replace (the UI
"Combine" menu over `IDataSet.zip`, SURVEY.md §2.7 V1).

Spark translation: a View is (base DataFrame, predicate stack, derived
columns, record order). Compilation emits `base.filter(p1 & p2 ...)` —
lazy, zero-copy, and Catalyst's CombineFilters collapses the stack into a
single scan predicate that pushes down to parquet. Membership-set algebra
becomes boolean algebra on predicates, so combining two views of the same
base never materializes either side.

At scale this matters: a hiero-style drill-down session (filter -> histogram
-> brush -> filter ...) stays a single parquet scan with one fused predicate,
no intermediate caching required.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RecordOrder:
    """Multi-column lexicographic order (hiero `table/RecordOrder.java`).

    `cols` is a list of (name, ascending) pairs. Nulls sort first when
    ascending, last when descending — one consistent total-order convention
    (matches DuckDB's NULLS FIRST default for ASC... see to_sql()).
    """

    cols: tuple[tuple[str, bool], ...]

    def to_columns(self) -> list[Column]:
        out = []
        for name, asc in self.cols:
            c = F.col(name)
            out.append(c.asc_nulls_first() if asc else c.desc_nulls_last())
        return out

    def to_sql(self) -> str:
        return ", ".join(
            f"{name} {'ASC NULLS FIRST' if asc else 'DESC NULLS LAST'}"
            for name, asc in self.cols
        )


@dataclass(frozen=True)
class View:
    """A hiero view: base table + predicate stack + derived columns + order.

    Immutable; every operation returns a new View sharing the base. Nothing
    executes until `df()` is called and an action runs on the result.
    """

    base: DataFrame
    predicates: tuple[Column, ...] = ()
    derived: tuple[tuple[str, Column], ...] = ()
    order: RecordOrder | None = None

    # -- hiero map operations (SURVEY.md §2.2, §2.8) --------------------
    def filter(self, pred: Column) -> "View":
        return replace(self, predicates=self.predicates + (pred,))

    def with_column(self, name: str, expr: Column) -> "View":
        return replace(self, derived=self.derived + ((name, expr),))

    def ordered(self, order: RecordOrder) -> "View":
        return replace(self, order=order)

    # -- combine (hiero V1: zip + membership-set ops) -------------------
    def _combined_pred(self) -> Column | None:
        pred = None
        for p in self.predicates:
            pred = p if pred is None else (pred & p)
        return pred

    def _require_same_base(self, other: "View") -> None:
        if other.base is not self.base:
            raise ValueError(
                "combine requires views of the same base table "
                "(hiero zip semantics); use relational set ops otherwise"
            )

    def union(self, other: "View") -> "View":
        self._require_same_base(other)
        p1, p2 = self._combined_pred(), other._combined_pred()
        if p1 is None or p2 is None:  # either side is the full table
            return replace(self, predicates=())
        return replace(self, predicates=(p1 | p2,))

    def intersect(self, other: "View") -> "View":
        self._require_same_base(other)
        return replace(self, predicates=self.predicates + other.predicates)

    def exclude(self, other: "View") -> "View":
        """Rows in self but not in other (hiero Combine/Exclude).

        Membership is boolean: a row whose predicate evaluates to NULL
        (e.g. a comparison on a null column) is NOT a member of `other`,
        so exclude must KEEP it.  A bare `~p2` would return NULL for such
        rows and the filter would silently drop them — same latent-bug
        class as the round-10 EXCEPT finding (invisible on null-free
        oracle data).  `~coalesce(p2, false)` pins three-valued logic to
        the membership reading: drop iff p2 is literally TRUE.
        """
        self._require_same_base(other)
        p2 = other._combined_pred()
        if p2 is None:
            # excluding the full table leaves nothing
            return replace(self, predicates=self.predicates + (F.lit(False),))
        return replace(
            self, predicates=self.predicates + (~F.coalesce(p2, F.lit(False)),)
        )

    def set_to(self, other: "View") -> "View":
        """Replace: adopt the other view's membership (hiero Combine/Replace)."""
        self._require_same_base(other)
        return other

    # -- compile ---------------------------------------------------------
    def df(self) -> DataFrame:
        out = self.base
        for name, expr in self.derived:
            out = out.withColumn(name, expr)
        pred = self._combined_pred()
        if pred is not None:
            out = out.filter(pred)
        if self.order is not None:
            out = out.orderBy(*self.order.to_columns())
        return out


@dataclass
class ViewRegistry:
    """Session-level registry of named views with result memoization.

    Mirrors hiero's RPC target-id table + `MemoizedResults` cache
    (SURVEY.md §3.3): each filter/derive creates a new target id; sketch
    results are memoized per (view, op-fingerprint).
    """

    views: dict[str, View] = field(default_factory=dict)
    _memo: dict[tuple[str, str], object] = field(default_factory=dict)
    _counter: int = 0

    def add(self, view: View, name: str | None = None) -> str:
        if name is None:
            self._counter += 1
            name = f"view_{self._counter}"
        self.views[name] = view
        return name

    def get(self, name: str) -> View:
        return self.views[name]

    def memoized(self, view_id: str, fingerprint: str, compute):
        key = (view_id, fingerprint)
        if key not in self._memo:
            self._memo[key] = compute()
        return self._memo[key]
