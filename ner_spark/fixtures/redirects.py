"""Deterministic redirect-KB fixture for the sameAs/canonicalization path.

Exercises J10 end-to-end (redirect_edges → connected components →
sameas_triples): redirect chains, a cluster-joining multi-redirect, and a
dangling redirect that must produce no edge.  Shared by the Spark query
and the DuckDB oracle generator — do not reorder (ids positional)."""

from __future__ import annotations

ROWS = [
    dict(id=1, type="thing", name="Alpha"),
    dict(id=2, type="thing", name="AlphaOld", redirects="Alpha"),
    dict(id=3, type="thing", name="AlphaAncient", redirects="AlphaOld"),
    dict(id=4, type="thing", name="Beta"),
    # multi-valued redirect joins the Alpha and Beta clusters
    dict(id=5, type="thing", name="BetaAlias", redirects="Beta|Alpha"),
    dict(id=6, type="thing", name="Gamma"),
    dict(id=7, type="thing", name="GammaAlt", redirects="Gamma"),
    # dangling redirect target → no edge, no sameAs row
    dict(id=8, type="thing", name="Solo", redirects="NoSuchName"),
]


def redirect_rows() -> list[dict]:
    return [dict(r) for r in ROWS]


def _edges_values_sql(rows: list[dict]) -> str:
    """The (src, dst) edge list a KB row set implies, as a SQL VALUES
    clause — an independent hand-derivation (redirect name → id by NAME
    lookup) used to build the DuckDB oracles.  The independence that
    matters is Spark-path vs SQL-path, so both fixtures sharing this
    derivation loses nothing and keeps the '|'-split in one place."""
    name_to_id = {r["name"]: r["id"] for r in rows}
    pairs = []
    for r in rows:
        for rname in (r.get("redirects") or "").split("|"):
            if rname and rname in name_to_id:
                pairs.append((r["id"], name_to_id[rname]))
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    return f"(VALUES {vals}) AS e(src, dst)"


def edges_values_sql() -> str:
    return _edges_values_sql(ROWS)


# --- typed variant for the sameAs type-conflict QA query -------------------
# Two conflicted alias clusters and one homogeneous one; kept SEPARATE from
# ROWS so the kgc_sameas fixture (and its oracle/goldens) stay untouched.
TYPED_ROWS = [
    dict(id=1, type="person", name="Alpha"),
    dict(id=2, type="thing", name="AlphaOld", redirects="Alpha"),
    dict(id=3, type="location", name="Gamma"),
    dict(id=4, type="location", name="GammaAlt", redirects="Gamma"),
    dict(id=5, type="person", name="Delta"),
    dict(id=6, type="person", name="DeltaAlias", redirects="Delta"),
    dict(id=7, type="thing", name="DeltaThing", redirects="DeltaAlias"),
]


def typed_rows() -> list[dict]:
    return [dict(r) for r in TYPED_ROWS]


def typed_edges_values_sql() -> str:
    return _edges_values_sql(TYPED_ROWS)


def typed_types_values_sql() -> str:
    vals = ", ".join(f"({r['id']}, '{r['type']}')" for r in TYPED_ROWS)
    return f"(VALUES {vals}) AS kb(id, type)"
