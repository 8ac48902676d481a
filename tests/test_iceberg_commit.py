"""Iceberg write-then-read commit closure: the append operation's
encode path, the re-plan equality, its falsifiability (a wrong
writer is caught), typed verdicts, and the oracle compare."""

from __future__ import annotations

import pytest

from pyspark_postgres_loader_spark.operators.avrowalk import walk_avro
from pyspark_postgres_loader_spark.operators.iceberg import (
    _IC_GROUPS,
    _ic_store,
    walk_iceberg_snapshot,
)
from pyspark_postgres_loader_spark.operators.icebergcommit import (
    _icc_facts,
    _new_entries,
    append_snapshot,
)


def test_closure_equality_every_group():
    for g in range(_IC_GROUPS):
        doc = next(d for d in range(g, 4000, _IC_GROUPS)
                   if d % 11 != 3 and d % 17 != 2 and d % 13 != 5)
        f = _icc_facts(doc)
        assert f[0] == "decoded"
        assert f[-1] == 1, f  # eq_fold: re-planned == base + input


def test_commit_is_reencoded_not_byte_copied():
    """The new manifest list must decode to the base rows + the new
    row, and the base rows must have traveled through parse +
    re-encode (the container differs even before the appended row:
    fresh sync marker)."""
    mlist, store = _ic_store(2, False)
    entries = _new_entries(2)
    mlist2, store2 = append_snapshot(
        mlist, store, entries, 999, "meta/new.avro")
    base_rows = walk_avro(mlist)["records"]
    new_rows = walk_avro(mlist2)["records"]
    assert new_rows[:-1] == base_rows
    assert new_rows[-1] == ("meta/new.avro", len(entries), 0)
    assert mlist2[-16:] != mlist[-16:]  # fresh sync — not a byte copy
    assert "meta/new.avro" in store2 and "meta/new.avro" not in store
    # the written manifest decodes to exactly the appended entries
    man = walk_avro(store2["meta/new.avro"])
    assert [(r[0], r[3], r[4], r[5]) for r in man["records"]] == entries


def test_closure_is_falsifiable():
    """A writer that persists the WRONG manifest under the committed
    path must break the equality — swap in a manifest encoding a
    different group's entries and check the totals diverge from
    base + input."""
    mlist, store = _ic_store(0, False)
    good = _new_entries(0)
    wrong = [(1, 9999, 1, None)]  # one entry, absurd row count
    m_good, s_good = append_snapshot(mlist, store, good, 5, "meta/c.avro")
    _m_bad, s_bad = append_snapshot(mlist, store, wrong, 5, "meta/c.avro")
    f0 = walk_iceberg_snapshot(mlist, store)
    swapped = dict(s_good)
    swapped["meta/c.avro"] = s_bad["meta/c.avro"]
    f2 = walk_iceberg_snapshot(m_good, swapped)
    exp_rows = f0["live_rows"] + sum(e[1] for e in good)
    assert f2["live_rows"] != exp_rows


def test_typed_verdicts():
    assert _icc_facts(3)[0] == "corrupt_commit"
    assert _icc_facts(2)[0] == "missing"
    assert _icc_facts(5)[0] == "unsupported"


def test_append_refuses_non_list_target():
    mlist, store = _ic_store(1, False)
    manifest = store["meta/m1_0.avro"]  # a manifest, not a list
    with pytest.raises(ValueError, match="not a manifest list"):
        append_snapshot(manifest, store, _new_entries(1), 7, "meta/x.avro")


def test_query_matches_oracle(spark):
    import sys

    sys.path.insert(0, "tests")
    from oracle_harness import compare_query

    compare_query(spark, "/root/testdata/sf0.001",
                  "iceberg_commit_roundtrip")
