"""HTTP serving layer (``server.py``): routes, validation, concurrency.

The reference has no serving surface at all; this covers the framework's
deployment path: Predictor behind stdlib HTTP with fixed-shape batching.
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from msha_gnn_tpu.serving import Predictor
from msha_gnn_tpu.server import MAX_NODES, ModelService, make_server
from msha_gnn_tpu.training import TrainState, msha_task
from tests.test_training import make_tiny_flow


@pytest.fixture(scope="module")
def service():
    rng = np.random.default_rng(0)
    fg, src, dst = make_tiny_flow(rng)
    task, variables, _ = msha_task(fg, in_features=8, out_features=4,
                                   lr=0.01, use_intra=False)
    state = TrainState.create(variables, task.tx)
    pred = Predictor.from_state(task, state, batch_size=16)
    return ModelService(
        pred, n_src=fg.n_src,
        class_names={i: f"P{i}" for i in range(fg.n_dst)},
        metadata={"model": "ablation3", "year": "tiny", "n_dst": fg.n_dst},
    )


@pytest.fixture(scope="module")
def base_url(service):
    httpd = make_server(service, port=0)  # free port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    httpd.server_close()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_and_metadata(base_url, service):
    code, body = _get(base_url + "/healthz")
    assert code == 200 and body == {"status": "ok"}
    code, body = _get(base_url + "/v1/metadata")
    assert code == 200
    assert body["model"] == "ablation3" and body["n_src"] == service.n_src
    assert body["batch_size"] == 16


def test_predict_route(base_url):
    code, body = _post(base_url + "/v1/predict",
                       {"nodes": [0, 3, 17], "k": 2})
    assert code == 200
    res = body["results"]
    assert [r["node"] for r in res] == [0, 3, 17]
    for r in res:
        assert len(r["top"]) == 2
        ps = [e["p"] for e in r["top"]]
        assert ps == sorted(ps, reverse=True)
        assert r["top"][0]["name"] == f"P{r['top'][0]['class']}"


def test_scores_route_matches_predictor(base_url, service):
    code, body = _post(base_url + "/v1/scores", {"nodes": [1, 2]})
    assert code == 200
    got = np.asarray(body["log_scores"])
    want = service.predictor.log_scores(np.asarray([1, 2], np.int32))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_validation_errors(base_url, service):
    for payload in ({}, {"nodes": []}, {"nodes": "0,1"},
                    {"nodes": [0.5]}, {"nodes": [-1]},
                    {"nodes": [service.n_src]}):
        code, body = _post(base_url + "/v1/predict", payload)
        assert code == 400, payload
        assert "error" in body
    # ADVICE r2: valid-JSON non-dict bodies and non-numeric k must be a
    # clean 400, not a dropped connection
    for raw in ([1, 2], "nodes", 7):
        code, body = _post(base_url + "/v1/predict", raw)
        assert code == 400 and "error" in body, raw
    code, body = _post(base_url + "/v1/predict", {"nodes": [0], "k": []})
    assert code == 400 and "error" in body
    code, body = _post(base_url + "/v1/nope", {"nodes": [0]})
    assert code == 404
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(base_url + "/nope")
    assert exc.value.code == 404


def test_node_cap(service):
    with pytest.raises(ValueError):
        service.predict(list(range(MAX_NODES + 1)))


def test_concurrent_requests_consistent(base_url):
    """The device lock keeps interleaved requests correct: N threads
    querying the same nodes all see identical scores."""
    results = [None] * 8

    def worker(i):
        _, body = _post(base_url + "/v1/scores", {"nodes": [5, 7, 11]})
        results[i] = np.asarray(body["log_scores"])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    for r in results[1:]:
        np.testing.assert_array_equal(r, results[0])
