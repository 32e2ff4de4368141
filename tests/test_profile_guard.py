"""Degeneracy guard for the driver-slot fixture profiles (CLAUDE.md
invariant): CLEAN_LINES_KW / GOPHER_KW are tuned to the SYNTHETIC fixture
so the driver checks stay NON-DEGENERATE — the rules must actually fire
on some docs and pass others. A well-meaning 'fix back to the paper
defaults' (terminal-punct rule on, min_stop_hits=2) silently turns the
slots into empty or all-pass tables, and the driver hash would still be
green; this test fails fast instead."""

SF = "/root/testdata/sf0.001"


def _docs():
    from shaclapi_ray.io import read_table_split

    return read_table_split(f"{SF}/documents.parquet")


def test_clean_lines_profile_not_degenerate(ray_session):
    from __ray_entry__ import CLEAN_LINES_KW
    from shaclapi_ray.pipelines.textstats import clean_lines

    out = clean_lines(_docs(), **CLEAN_LINES_KW).to_pandas()
    kept = int(out["n_kept_lines"].sum())
    dropped = int(out["n_dropped_lines"].sum())
    assert kept > 0, (
        "CLEAN_LINES_KW keeps zero lines on the fixture — the driver slot "
        "is degenerate (did someone re-enable require_terminal_punct? the "
        "fixture text has no sentence punctuation)"
    )
    assert dropped > 0, (
        "CLEAN_LINES_KW drops zero lines on the fixture — the line rules "
        "never fire, the slot is a pass-through"
    )


def test_gopher_profile_not_degenerate(ray_session):
    from __ray_entry__ import GOPHER_KW
    from shaclapi_ray.pipelines.textstats import gopher_rules

    out = gopher_rules(_docs(), **GOPHER_KW).to_pandas()
    n_pass = int(out["gopher_pass"].sum())
    assert 0 < n_pass < len(out), (
        f"GOPHER_KW verdict is degenerate on the fixture "
        f"({n_pass}/{len(out)} pass) — did someone raise min_stop_hits "
        "back to the paper default? the fixture vocabulary carries one "
        "Gopher stop word"
    )


def test_urlq_profile_not_degenerate(ray_session):
    """URLQ_KW must block some urls and keep others at BOTH driver
    scales. At sf0.001 only the planted ''/null/scheme-less urls fall
    (the digit rule is silent by design); at sf0.01 the digit rule
    crosses 16% around row index 10000 and splits the table — checked
    via the SQL side alone (no 20k-row Ray pass in the guard)."""
    import duckdb
    import ray.data

    from __ray_entry__ import URLQ_KW
    from shaclapi_ray.oracles import url_quality_sql
    from shaclapi_ray.pagegen import ensure_pages
    from shaclapi_ray.pipelines.extract import url_quality_filter

    pages = ray.data.read_parquet(ensure_pages(SF), columns=["url"])
    out = url_quality_filter(pages, **URLQ_KW).to_pandas()
    n_kept = int(out["kept"].sum())
    assert 0 < n_kept < len(out), (
        f"URLQ_KW verdict is degenerate at sf0.001 ({n_kept}/{len(out)} "
        "kept) — the planted url violations must be blocked and the "
        "clean absolute urls kept"
    )
    counts = duckdb.sql(
        "SELECT kept, count(*) AS n FROM ("
        + url_quality_sql(ensure_pages("/root/testdata/sf0.01"), **URLQ_KW)
        + ") GROUP BY kept"
    ).df()
    by = dict(zip(counts.kept, counts.n))
    assert by.get(True, 0) > 0 and by.get(False, 0) > 0, (
        f"URLQ_KW verdict is degenerate at sf0.01 ({by}) — max_digit_pct "
        "must sit where fixture digit shares straddle it"
    )
    assert by.get(False, 0) > len(out), (
        f"digit rule never fires at sf0.01 ({by}) — blocked count should "
        "far exceed the 3% planted violations"
    )


def test_hostbp_profile_not_degenerate(ray_session):
    """HOSTBP_KW (sep=' ', frac 4/5) must drop some per-source
    ubiquitous words and keep others at BOTH driver scales — the fixture
    documents have no paragraph separators, so reverting sep to the
    paper-default '\\n\\n' silently turns the hb_* columns into a
    pass-through. Checked via the SQL side alone at sf0.01 (no 20k-row
    Ray pass in the guard)."""
    import duckdb

    from __ray_entry__ import HOSTBP_KW
    from shaclapi_ray.pipelines.dedup import host_boilerplate, host_boilerplate_sql

    from shaclapi_ray.io import read_table_split

    out = host_boilerplate(
        read_table_split(f"{SF}/documents.parquet"), **HOSTBP_KW
    ).to_pandas()
    dropped, kept = int(out["n_dropped"].sum()), int(out["n_kept"].sum())
    assert dropped > 0 and kept > 0, (
        f"HOSTBP_KW is degenerate at sf0.001 (kept={kept}, "
        f"dropped={dropped}) — did someone revert sep to '\\n\\n'? the "
        "fixture documents are single-line"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    row = con.execute(
        "SELECT sum(n_kept), sum(n_dropped) FROM ("
        + host_boilerplate_sql(**HOSTBP_KW)
        + ")"
    ).fetchone()
    assert row[0] > 0 and row[1] > 0, (
        f"HOSTBP_KW is degenerate at sf0.01 (kept={row[0]}, "
        f"dropped={row[1]}) — the 4/5 threshold must sit inside the "
        "fixture's per-source word doc-frequency band"
    )


def test_profile_drift_slot_not_degenerate():
    """The psi_drift slot's kind='profile' part must have SOME drifted
    and SOME clean checks on the DELTA-derived fixture crawls at both
    driver scales — a DELTA_* rule change that equalizes the two sides
    (or a tolerance change that fires everywhere) would keep the hash
    green while gutting the check. SQL-side only (no Ray pass)."""
    import duckdb

    from __ray_entry__ import (
        DRIFT_PROFILE_COLUMNS,
        _delta_new_src,
        _delta_old_src,
    )
    from shaclapi_ray.pagegen import ensure_pages
    from shaclapi_ray.pipelines.profile import profile_drift_sql

    for sf in (SF, "/root/testdata/sf0.01"):
        pages_dir = ensure_pages(sf)
        df = duckdb.sql(
            profile_drift_sql(
                _delta_old_src(pages_dir),
                _delta_new_src(pages_dir),
                columns=DRIFT_PROFILE_COLUMNS,
            )
        ).df()
        n_drift = int(df["drifted"].sum())
        assert 0 < n_drift < len(df), (
            f"profile-drift verdicts degenerate at {sf}: "
            f"{n_drift}/{len(df)} drifted"
        )


def test_cap_profile_not_degenerate():
    """CAP_K must actually cap (some rows dropped) while keeping rows
    from every real host at BOTH driver scales — K above the per-host
    page count would turn the top_hosts slot's kind='cap' part into a
    pass-through with a still-green hash. SQL-side only."""
    import duckdb

    from __ray_entry__ import CAP_K
    from shaclapi_ray.oracles import cap_per_host_sql
    from shaclapi_ray.pagegen import ensure_pages

    for sf in (SF, "/root/testdata/sf0.01"):
        pages_dir = ensure_pages(sf)
        total = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{pages_dir}/*.parquet')"
        ).fetchone()[0]
        df = duckdb.sql(
            "SELECT host, count(*) AS n FROM ("
            + cap_per_host_sql(pages_dir, CAP_K)
            + ") GROUP BY host"
        ).df()
        kept = int(df["n"].sum())
        assert 0 < kept < total, (
            f"CAP_K={CAP_K} keeps {kept}/{total} rows at {sf} — the cap "
            "never fires (or drops everything); fixture hosts carry "
            "~180/~1800 docs, K must sit below that"
        )
        real_hosts = df[df["host"].str.contains("example", na=False)]
        assert (real_hosts["n"] == CAP_K).any(), (
            f"no real host is AT the cap at {sf} — K no longer binds"
        )


def test_delta_profile_not_degenerate():
    """The DELTA_DROP_OLD/DELTA_DROP_NEW/DELTA_CHANGE derivation rules
    must keep all four snapshot_delta statuses (added/removed/changed/
    unchanged) populated at BOTH driver scales — losing one silently
    guts the snapshot_delta slot and the kind='delta'/'profile' parts
    that share the derivation. SQL-side only."""
    import duckdb

    from __ray_entry__ import _delta_new_src, _delta_old_src
    from shaclapi_ray.oracles import snapshot_delta_sql
    from shaclapi_ray.pagegen import ensure_pages

    for sf in (SF, "/root/testdata/sf0.01"):
        pages_dir = ensure_pages(sf)
        df = duckdb.sql(
            "SELECT status, count(*) AS n FROM ("
            + snapshot_delta_sql(_delta_old_src(pages_dir), _delta_new_src(pages_dir))
            + ") GROUP BY status"
        ).df()
        by = dict(zip(df.status, df.n))
        for status in ("added", "removed", "changed", "unchanged"):
            assert by.get(status, 0) > 0, (
                f"snapshot_delta status '{status}' is empty at {sf} "
                f"({by}) — check the DELTA_* rules in __ray_entry__.py"
            )
