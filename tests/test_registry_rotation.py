"""Contract tests for the driver-sampling order (VERDICT r12 #7).

The driver samples a ~50-query PREFIX of queries(); registry.ordered_specs
must therefore put (1) never-driver-green queries first, then (2) proven
queries STALEST-first (ascending by the newest round that certified them),
so every driver round re-certifies whatever has gone longest unchecked.
These tests pin the contract against the real committed CORRECTNESS_r*.json
artifacts — if the ordering regresses, the driver silently stops rotating.
"""

from __future__ import annotations

from gtec_etl_spark.plans import registry


def test_never_verified_queries_lead_the_order():
    ordered = list(registry.ordered_specs())
    verified = registry._driver_verified_rounds()
    fresh = [n for n in ordered if n not in verified]
    # Every never-verified query must appear before every verified one.
    if fresh:
        last_fresh = max(ordered.index(n) for n in fresh)
        first_proven = min(
            ordered.index(n) for n in ordered if n in verified
        )
        assert last_fresh < first_proven, (
            "never-driver-green queries must form a strict prefix; "
            f"fresh up to {last_fresh}, proven from {first_proven}"
        )


def test_proven_queries_are_stalest_first():
    ordered = list(registry.ordered_specs())
    verified = registry._driver_verified_rounds()
    rounds = [verified[n] for n in ordered if n in verified]
    assert rounds == sorted(rounds), (
        "proven queries must be ordered ascending by latest-green round "
        "(stalest first) so the driver prefix rotates re-certification"
    )


def test_rotation_covers_whole_registry():
    # ordered_specs must be a permutation of specs — ordering only.
    assert set(registry.ordered_specs()) == set(registry.specs())
    assert len(registry.ordered_specs()) == len(registry.specs())


def test_red_rows_do_not_count_as_verified():
    # A row with err set, or hash_match False, must not mark a query
    # verified (it needs a retry slot). Build the check from the parsing
    # rules directly: any name in the map must have at least one green
    # row in some committed file.
    import glob
    import json
    import pathlib

    root = pathlib.Path(registry.__file__).resolve().parents[2]
    verified = registry._driver_verified_rounds()
    green: set[str] = set()
    for path in glob.glob(str(root / "CORRECTNESS_r*.json")):
        try:
            data = json.load(open(path))
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict) or row.get("err") is not None:
                continue
            if row.get("hash_match") is True or (
                row.get("hash_match") is None
                and row.get("rows_match") is True
            ):
                green.add(name)
    assert set(verified) <= green
