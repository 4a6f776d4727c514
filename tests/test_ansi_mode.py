"""ANSI-mode totality gate.

Production Spark clusters increasingly run ``spark.sql.ansi.enabled=
true`` (the Spark 4 default), where a non-total expression — an array
index past the end, a division whose guard Catalyst reorders away, a
cast that overflows — fails the QUERY instead of returning NULL. The
repo's expression-totality convention (see shingle_arrays) exists for
exactly this; this gate runs EVERY registered query under ANSI at
sf0.001 so a partial expression introduced anywhere in the registry
fails CI, not a customer's 100 TB job.

Costs ~2-3 min (one count per query on the smallest fixture) — the
single most expensive test in the suite, and the only one that proves
the whole surface survives the strict dialect.
"""

import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ansi(spark):
    # No fallback arg: conf.get(key, default) returns the literal default
    # whenever the key was never explicitly SET, even though Spark 4's
    # effective session default is "true" — restoring that literal would
    # force-disable ANSI for every later test in the suite (observed as
    # size(NULL) flipping NULL -> -1 in the hygiene robustness test).
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


def test_every_registered_query_is_ansi_total(ansi):
    fails = []
    for name, fn in sorted(E.queries().items()):
        try:
            fn(ansi, SF).count()
        except Exception as e:  # noqa: BLE001 - collecting per-query
            msg = (str(e).splitlines() or ["<no message>"])[0]
            fails.append((name, msg[:160]))
    assert not fails, f"non-ANSI-total queries: {fails}"
