"""HTTP surface tests — the reference's /multiprocessing, /validation,
/reduce routes (/root/reference/run.py:21-62) served by the stdlib
server over the same library API."""

import json
import threading
import urllib.request

import pytest


@pytest.fixture(scope="module")
def server(ray_session):
    from shaclapi_ray.server import make_server

    srv = make_server(port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


@pytest.fixture(scope="module")
def schema_dir(tmp_path_factory):
    import json as _json

    from shaclapi_ray.fixtures import referential_schema
    from shaclapi_ray.shapes.ir import shape_to_dict

    d = tmp_path_factory.mktemp("schemas")
    for s in referential_schema():
        (d / f"{s.shape_id}.json").write_text(_json.dumps(shape_to_dict(s)))
    return str(d)


def _post(url: str, payload: dict, as_form: bool = False):
    if as_form:
        from urllib.parse import urlencode

        data = urlencode(payload).encode()
        req = urllib.request.Request(
            url, data=data,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
    else:
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def test_healthcheck(server):
    with urllib.request.urlopen(f"{server}/healthcheck") as r:
        assert json.loads(r.read()) == {"status": "ok"}


def test_reduce_route(server, schema_dir):
    status, out = _post(
        f"{server}/reduce",
        {"schemaDir": schema_dir, "targetShape": "LinkedPageShape"},
    )
    assert status == 200
    assert out == ["TargetPageShape", "LinkedPageShape"]


def test_validation_route(server, schema_dir, small_pages_dir):
    status, out = _post(
        f"{server}/validation",
        {"schema_dir": schema_dir, "pages_dir": small_pages_dir},
    )
    assert status == 200
    assert set(out) == {"TargetPageShape", "LinkedPageShape"}
    tp = out["TargetPageShape"]
    assert tp["valid"] + tp["invalid"] == 600


def test_multiprocessing_route_matches_library(server, schema_dir, small_pages_dir):
    from shaclapi_ray.api import run_job

    cfg = {
        "schemaDir": schema_dir,
        "pagesDir": small_pages_dir,
        "targetShape": "LinkedPageShape",
    }
    status, out = _post(f"{server}/multiprocessing", cfg)
    assert status == 200
    lib = run_job(dict(cfg))
    assert sorted(map(tuple, out["result"]["validTargets"])) == sorted(
        lib["result"]["validTargets"]
    )
    assert out["order"] == lib["order"]


def test_form_encoded_body(server, schema_dir):
    status, out = _post(
        f"{server}/reduce",
        {"schemaDir": schema_dir, "targetShape": "TargetPageShape"},
        as_form=True,
    )
    assert status == 200
    assert out == ["TargetPageShape"]


def test_bad_request_and_404(server):
    status, out = _post(f"{server}/reduce", {})
    assert status == 400 and "error" in out
    status, out = _post(f"{server}/nope", {})
    assert status == 404


def test_pipeline_route(server, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path_factory.mktemp("pipe") / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(12), pa.int64()),
                "text": pa.array([f"t {i % 4}" for i in range(12)]),
            }
        ),
        src,
    )
    status, out = _post(
        f"{server}/pipeline", {"pipeline": "exact_dedup", "input": src}
    )
    assert status == 200 and out["rows"] == 4
    status, out = _post(f"{server}/pipeline", {"pipeline": "nope", "input": src})
    assert status == 400 and "error" in out
