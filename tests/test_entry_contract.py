"""Driver-contract guards: the CORRECTNESS gate checks only the FIRST 50
queries() entries, so the registry must stay at EXACTLY 50 slots with an
oracle_sql() entry for every one (the round-2 verdict's top finding was
16 queries silently falling outside the window). Also checks the
module-level rules: no ray.init at import, oracle keys == query keys."""

import importlib.util


def _entry():
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__guard", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_exactly_50_slots_all_oracled():
    mod = _entry()
    qs = mod.queries()
    osql = mod.oracle_sql()
    assert len(qs) == 50, (
        f"queries() must register EXACTLY 50 slots (driver window); got "
        f"{len(qs)} — merge near-duplicates into kind-tagged unions or "
        f"key joins instead of appending"
    )
    missing = sorted(set(qs) - set(osql))
    assert not missing, f"slots without an oracle_sql entry: {missing}"
    extra = sorted(set(osql) - set(qs))
    assert not extra, f"oracle_sql entries without a queries() slot: {extra}"


def test_registry_order_is_stable():
    """dict order IS the driver window — a reordering reshuffles which
    queries get checked; both calls must agree."""
    mod = _entry()
    assert list(mod.queries()) == list(_entry().queries())


def test_import_does_not_init_ray():
    import ray

    was = ray.is_initialized()
    _entry()
    assert ray.is_initialized() == was
