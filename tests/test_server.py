"""HTTP serving front-end: concurrent requests over a live engine loop
match direct-engine greedy outputs; stats endpoint; error handling."""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import pytest

from nnop_tpu.models.llama import LlamaConfig, init_params
from nnop_tpu.runtime.engine import Engine
from nnop_tpu.runtime.server import EngineServer

CFG = LlamaConfig.tiny(dtype=jnp.float32)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.key(0), CFG)


def _post(port, payload, path="/v1/completions"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=30
    ) as r:
        return r.status, json.loads(r.read())


def test_server_serves_concurrent_requests(params):
    # direct-engine oracle (greedy is deterministic)
    prompts = [[5, 17, 42, 7], [9, 1, 3, 8, 2], [100, 50, 25]]
    oracle = Engine(params, CFG, max_batch=2, max_seq=64)
    reqs = [oracle.submit(p, max_new_tokens=6) for p in prompts]
    oracle.run()
    want = [r.out for r in reqs]

    eng = Engine(params, CFG, max_batch=2, max_seq=64)
    with EngineServer(eng) as srv:
        st, h = _get(srv.port, "/health")
        assert (st, h["status"]) == (200, "ok")

        results = [None] * len(prompts)

        def call(i):
            st, out = _post(srv.port,
                            {"prompt": prompts[i], "max_tokens": 6})
            results[i] = (st, out)

        ts = [threading.Thread(target=call, args=(i,))
              for i in range(len(prompts))]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)

        for i, (st, out) in enumerate(results):
            assert st == 200
            assert out["tokens"] == want[i], (i, out, want[i])

        st, stats = _get(srv.port, "/v1/stats")
        assert st == 200
        assert stats["requests_completed"] == 3
        assert stats["tokens_generated"] == sum(len(w) for w in want)
        assert stats["queue_depth"] == 0
        assert stats["active_slots"] == 0


def test_server_rejects_bad_requests(params):
    eng = Engine(params, CFG, max_batch=1, max_seq=64)
    with EngineServer(eng) as srv:
        # missing prompt
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/completions",
            data=b"{}", headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # unknown path
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/nope", timeout=30
            )
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404


def test_server_streams_tokens(params):
    """stream=true: SSE events deliver tokens incrementally (>= 2 chunk
    events for a 2-chunk generation) and concatenate to the oracle."""
    import http.client

    oracle = Engine(params, CFG, max_batch=2, max_seq=64, chunk_size=4)
    want = oracle.submit([5, 17, 42, 7], max_new_tokens=10)
    oracle.run()

    eng = Engine(params, CFG, max_batch=2, max_seq=64, chunk_size=4)
    with EngineServer(eng) as srv:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port,
                                          timeout=120)
        conn.request(
            "POST", "/v1/completions",
            body=json.dumps({"prompt": [5, 17, 42, 7], "max_tokens": 10,
                             "stream": True}),
            headers={"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "text/event-stream"
        events = []
        buf = b""
        while True:
            chunk = resp.read(1)
            if not chunk:
                break
            buf += chunk
            while b"\n\n" in buf:
                raw, buf = buf.split(b"\n\n", 1)
                assert raw.startswith(b"data: ")
                payload = raw[len(b"data: "):]
                if payload == b"[DONE]":
                    events.append(None)
                else:
                    events.append(json.loads(payload)["tokens"])
        conn.close()

    assert events[-1] is None
    token_events = [e for e in events if e is not None]
    assert len(token_events) >= 2, token_events  # incremental delivery
    got = [t for e in token_events for t in e]
    assert got == want.out, (got, want.out)


def test_server_backpressure_429(params):
    """/v1/completions returns 429 (with Retry-After) once the engine
    queue is full (VERDICT r3 item 10)."""
    import time

    eng = Engine(params, CFG, max_batch=1, max_seq=64, max_queue=1)
    with EngineServer(eng) as srv:
        # freeze the step loop so the queue cannot drain, then fill it
        srv._stop.set()
        srv._wake.set()
        time.sleep(0.3)
        eng.submit([1, 2], max_new_tokens=4)  # fills the queue
        try:
            _post(srv.port, {"prompt": [5, 6], "max_tokens": 4})
            raise AssertionError("expected 429")
        except urllib.error.HTTPError as e:
            assert e.code == 429
            assert e.headers.get("Retry-After") is not None


def test_server_cancel_endpoint(params):
    """POST /v1/cancel drops a queued request and wakes its handler."""
    import time

    eng = Engine(params, CFG, max_batch=1, max_seq=64)
    with EngineServer(eng) as srv:
        # freeze the step loop so both requests stay pending
        srv._stop.set()
        srv._wake.set()
        time.sleep(0.3)
        r1, _, _ = srv.submit([5, 17, 42], 4)
        r2, ev2, _ = srv.submit([9, 9, 9], 4)
        st, out = _post(srv.port, {"id": r2.rid}, path="/v1/cancel")
        assert (st, out["cancelled"]) == (200, True)
        assert ev2.wait(timeout=10)  # handler wakes immediately
        assert r2.cancelled and r2.out == []
        # r1 completes normally (drive the engine directly: loop frozen)
        eng.run()
        assert r1.done and len(r1.out) == 4
        # cancelling an unknown/finished id reports 404
        try:
            _post(srv.port, {"id": 999}, path="/v1/cancel")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
