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
