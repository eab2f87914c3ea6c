"""Testdata invariants the stream oracles depend on (ADVICE r05).

Two adopted oracles are equivalences that hold on the driver's
generated events table, not universally:

- q_stream_dedup counts DISTINCT event_id per event_type — equivalent
  to streaming dropDuplicates only while no event_id spans two
  event_types.
- q_stream_stateful_user's arg_max-by-ts oracle is deterministic only
  while (user_id, ts) pairs are unique.

The driver REGENERATES testdata between rounds, so a generation that
breaks either invariant would silently flip hash-green stream rows to
red with the code still correct. This test fails loudly and locally
first, against every scale dir present.
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest

_SF_DIRS = [p for p in Path("/root/testdata").glob("sf*") if (p / "events.parquet").exists()]


@pytest.mark.parametrize("sf_dir", _SF_DIRS, ids=[p.name for p in _SF_DIRS])
def test_events_invariants_for_stream_oracles(sf_dir):
    con = duckdb.connect()
    ev = f"read_parquet('{sf_dir}/events.parquet')"
    multi_type = con.sql(
        f"SELECT max(n) FROM (SELECT count(DISTINCT event_type) AS n FROM {ev} GROUP BY event_id)"
    ).fetchone()[0]
    assert multi_type == 1, (
        f"{sf_dir.name}: an event_id spans {multi_type} event_types — "
        "q_stream_dedup's distinct-id oracle is no longer equivalent"
    )
    dup_ts = con.sql(
        f"SELECT count(*) FROM (SELECT 1 FROM {ev} GROUP BY user_id, ts HAVING count(*) > 1)"
    ).fetchone()[0]
    assert dup_ts == 0, (
        f"{sf_dir.name}: {dup_ts} duplicate (user_id, ts) pairs — "
        "q_stream_stateful_user's arg_max oracle becomes nondeterministic"
    )


@pytest.mark.parametrize("sf_dir", _SF_DIRS, ids=[p.name for p in _SF_DIRS])
def test_documents_ascii_for_byte_feature_oracle(sf_dir):
    # q_multimodal_features' oracle equates UTF-8 payload bytes with
    # ascii() code points — valid only while documents.text is pure
    # ASCII. A regeneration introducing non-ASCII must fail here, not
    # drift the driver hash.
    con = duckdb.connect()
    n_bad = con.execute(
        "SELECT count(*) FROM read_parquet(?) "
        "WHERE octet_length(encode(text)) <> len(text)",
        [str(sf_dir / "documents.parquet")],
    ).fetchone()[0]
    assert n_bad == 0, f"{sf_dir}: {n_bad} docs with non-ASCII text"


@pytest.mark.parametrize("sf_dir", _SF_DIRS, ids=[p.name for p in _SF_DIRS])
def test_outer_join_oracle_inputs_nonempty(sf_dir):
    # The stream outer-join oracles derive the final watermark from
    # least(max view ts, max purchase ts); an empty side turns it NULL
    # and silently suppresses every null-padded row. Fail loudly if a
    # regeneration drops either event_type.
    con = duckdb.connect()
    ev = f"read_parquet('{sf_dir}/events.parquet')"
    n = con.sql(
        f"SELECT count(*) FILTER (WHERE event_type = 'view'), "
        f"count(*) FILTER (WHERE event_type = 'purchase') FROM {ev}"
    ).fetchone()
    assert n[0] > 0 and n[1] > 0, f"{sf_dir.name}: views={n[0]} purchases={n[1]}"


@pytest.mark.parametrize("sf_dir", _SF_DIRS, ids=[p.name for p in _SF_DIRS])
def test_documents_positive_length_for_weighted_sample(sf_dir):
    # q_weighted_sample divides ln(u) by n_chars; n_chars = 0 would put
    # engine-specific infinity/NULL semantics on the ranking path.
    con = duckdb.connect()
    n_bad = con.sql(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE n_chars IS NULL OR n_chars <= 0"
    ).fetchone()[0]
    assert n_bad == 0, f"{sf_dir.name}: {n_bad} docs with non-positive n_chars"


@pytest.mark.parametrize("sf_dir", _SF_DIRS, ids=[p.name for p in _SF_DIRS])
def test_documents_doc_id_non_null(sf_dir):
    """Every mapInPandas decode/tokenize query does `int(doc_id)` —
    pandas surfaces a nullable long with NULLs as float64 NaN, which
    int() rejects and the whole task dies. The generator has never
    produced a NULL doc_id; pin it so a regeneration that does fails
    here first, by name, instead of as an opaque executor crash."""
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE doc_id IS NULL"
    ).fetchone()[0]
    assert n == 0, f"{n} NULL doc_ids in {sf_dir}"
