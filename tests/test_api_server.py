"""HTTP serving API + device scheduler.

The reference only ships human front-ends (Gradio/CLI); the API server
is the deployment-grade machine front-end. These tests cover the
scheduler contract (FIFO, coalescing, backpressure, error isolation,
shutdown) with a fake executor, the HTTP layer over a stub runtime,
and one end-to-end pass through the real tiny UnivaRuntime.
"""

import base64
import io
import json
import threading
import time
import urllib.error
import urllib.request

import pytest
from PIL import Image

from gpt_image_edit_tpu.serve.api_server import ApiServer, RuntimeExecutor
from gpt_image_edit_tpu.serve.scheduler import (
    BatchItemErrors,
    DeviceScheduler,
    QueueFullError,
    SchedulerClosedError,
)


# ---------------------------------------------------------------------------
# scheduler unit tests
# ---------------------------------------------------------------------------
class TestDeviceScheduler:
    def test_fifo_order_and_results(self):
        order = []

        def ex(jobs):
            order.extend(j.request for j in jobs)
            return [j.request * 10 for j in jobs]

        s = DeviceScheduler(ex, max_batch=1)
        try:
            jobs = [s.submit(i) for i in range(5)]
            assert [j.result(5) for j in jobs] == [0, 10, 20, 30, 40]
            assert order == [0, 1, 2, 3, 4]
            st = s.stats()
            assert st["served"] == 5 and st["failed"] == 0
            assert st["latency_p50_s"] >= 0
        finally:
            s.shutdown()

    def test_coalesces_same_signature(self):
        release = threading.Event()
        batches = []

        def ex(jobs):
            release.wait(5)  # hold the worker so the queue builds up
            batches.append([j.request for j in jobs])
            return [j.request for j in jobs]

        s = DeviceScheduler(ex, max_batch=4, coalesce_window_s=0.0)
        try:
            first = s.submit("warm", signature="a")  # occupies the worker
            time.sleep(0.05)
            rest = [s.submit(i, signature="a") for i in range(3)]
            release.set()
            for j in [first] + rest:
                j.result(5)
            assert batches[0] == ["warm"]
            assert batches[1] == [0, 1, 2]  # coalesced into one batch
            assert s.stats()["batches"] == 2
        finally:
            s.shutdown()

    def test_mixed_signatures_batch_separately(self):
        release = threading.Event()
        batches = []

        def ex(jobs):
            release.wait(5)
            batches.append(sorted(j.request for j in jobs))
            return [j.request for j in jobs]

        s = DeviceScheduler(ex, max_batch=4)
        try:
            warm = s.submit(-1, signature=None)
            time.sleep(0.05)
            jobs = [
                s.submit(0, signature="a"),
                s.submit(1, signature="b"),
                s.submit(2, signature="a"),
                s.submit(3, signature=None),
            ]
            release.set()
            for j in [warm] + jobs:
                j.result(5)
            assert batches == [[-1], [0, 2], [1], [3]]
        finally:
            s.shutdown()

    def test_backpressure_queue_full(self):
        release = threading.Event()

        def ex(jobs):
            release.wait(5)
            return [None for _ in jobs]

        s = DeviceScheduler(ex, max_queue=2)
        try:
            s.submit(0)  # taken by the worker
            time.sleep(0.05)
            s.submit(1)
            s.submit(2)
            with pytest.raises(QueueFullError):
                s.submit(3)
            assert s.stats()["rejected"] == 1
            release.set()
        finally:
            s.shutdown()

    def test_batch_error_delivered_to_all(self):
        def ex(jobs):
            raise ValueError("device on fire")

        s = DeviceScheduler(ex)
        try:
            j = s.submit(1)
            with pytest.raises(ValueError, match="device on fire"):
                j.result(5)
            assert s.stats()["failed"] == 1
        finally:
            s.shutdown()

    def test_per_item_error_isolation(self):
        def ex(jobs):
            items = [
                RuntimeError("bad") if j.request == "bad" else "ok"
                for j in jobs
            ]
            raise BatchItemErrors(items)

        s = DeviceScheduler(ex)
        try:
            good, bad = s.submit("fine"), s.submit("bad")
            assert good.result(5) == "ok"
            with pytest.raises(RuntimeError, match="bad"):
                bad.result(5)
            st = s.stats()
            assert st["served"] == 1 and st["failed"] == 1
        finally:
            s.shutdown()

    def test_deadline_expires_queued_job(self):
        from gpt_image_edit_tpu.serve.scheduler import DeadlineExceededError

        release = threading.Event()
        ran = []

        def ex(jobs):
            release.wait(5)
            ran.extend(j.request for j in jobs)
            return [None for _ in jobs]

        s = DeviceScheduler(ex)
        try:
            s.submit(0)  # occupies the worker
            time.sleep(0.05)
            doomed = s.submit(1, queue_timeout_s=0.01)
            no_deadline = s.submit(2)
            time.sleep(0.1)  # deadline passes while the worker is held
            release.set()
            with pytest.raises(DeadlineExceededError):
                doomed.result(5)
            assert no_deadline.result(5) is None
            st = s.stats()
            assert st["expired"] == 1 and st["failed"] == 1
            assert 1 not in ran  # never reached the device
        finally:
            s.shutdown()

    def test_expired_jobs_swept_on_full_submit(self):
        from gpt_image_edit_tpu.serve.scheduler import DeadlineExceededError

        release = threading.Event()

        def ex(jobs):
            release.wait(5)
            return [None for _ in jobs]

        s = DeviceScheduler(ex, max_queue=1)
        try:
            s.submit(0)  # occupies the worker
            time.sleep(0.05)
            dead = s.submit(1, queue_timeout_s=0.01)
            time.sleep(0.05)  # deadline lapses; queue is nominally full
            ok = s.submit(2)  # sweeps the corpse instead of raising 503
            release.set()
            with pytest.raises(DeadlineExceededError):
                dead.result(5)
            assert ok.result(5) is None
            assert s.stats()["expired"] == 1
        finally:
            s.shutdown()

    def test_shutdown_fails_pending_and_rejects_new(self):
        release = threading.Event()

        def ex(jobs):
            release.wait(5)
            return [None for _ in jobs]

        s = DeviceScheduler(ex)
        s.submit(0)
        time.sleep(0.05)
        pending = s.submit(1)
        release.set()
        s.shutdown()
        with pytest.raises(SchedulerClosedError):
            pending.result(5)
        with pytest.raises(SchedulerClosedError):
            s.submit(2)


# ---------------------------------------------------------------------------
# HTTP layer over a stub runtime
# ---------------------------------------------------------------------------
def _png_b64(size=(8, 8), color=(255, 0, 0)) -> str:
    buf = io.BytesIO()
    Image.new("RGB", size, color).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


class StubRuntime:
    """Duck-typed runtime: records calls, returns tiny images/text."""

    def __init__(self):
        self.edit_calls = []
        self.lock = threading.Lock()

    def edit(self, instruction, image=None, **kw):
        with self.lock:
            self.edit_calls.append((instruction, image, kw))
        cb = kw.get("step_callback")
        if cb is not None:
            for i in range(kw.get("steps", 28)):
                cb(i)
        n = kw.get("num_images_per_prompt", 1)
        imgs = [Image.new("RGB", (4, 4), (0, 255, 0)) for _ in range(n)]
        return imgs if n > 1 else imgs[0]

    def chat(self, message, image=None, **kw):
        if image is not None:
            return Image.new("RGB", (4, 4)), None
        return None, f"echo: {message}"

    # multi-turn protocol used by /v1/conversations (duck-typed like
    # UnivaRuntime.chat_turn/reset_chat)
    def reset_chat(self):
        self.conversation = []
        self.history_images = []
        self._cond_cache = {}

    def chat_turn(self, message, new_images=None, **kw):
        if not hasattr(self, "conversation"):
            self.reset_chat()
        self.conversation.append({"from": "user", "value": message})
        self.history_images.extend(new_images or [])
        if self.history_images:
            img = Image.new("RGB", (4, 4), (0, 0, 255))
            self.history_images.append(img)
            self.conversation.append({"from": "assistant", "value": "<image>"})
            return img, None
        answer = f"turn {len(self.conversation)}: {message}"
        self.conversation.append({"from": "assistant", "value": answer})
        return None, answer


def _request(url, payload=None, method=None):
    if payload is not None:
        req = urllib.request.Request(
            url,
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method=method or "POST",
        )
    else:
        req = urllib.request.Request(url, method=method or "GET")
    # generous: tiny-runtime compiles can take minutes on a loaded CI CPU
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def stub_server():
    rt = StubRuntime()
    server = ApiServer(rt, "127.0.0.1", 0)  # ephemeral port
    server.start()
    host, port = server.address[:2]
    yield rt, f"http://{host}:{port}"
    server.shutdown()


class TestApiServer:
    def test_healthz_and_stats(self, stub_server):
        _, base = stub_server
        status, body = _request(f"{base}/healthz")
        assert status == 200 and body["status"] == "ok"
        assert body["backend"] == "cpu"  # conftest forces the CPU mesh
        status, body = _request(f"{base}/v1/stats")
        assert status == 200 and "served" in body

    def test_metrics_prometheus_format(self, stub_server):
        _, base = stub_server
        req = urllib.request.Request(f"{base}/metrics")
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert "# TYPE gie_served counter" in text
        assert "# TYPE gie_queue_depth gauge" in text
        # every line is either a comment or `name value`
        for line in text.strip().splitlines():
            assert line.startswith("# ") or len(line.split(" ")) == 2

    def test_edit_roundtrip(self, stub_server):
        rt, base = stub_server
        status, body = _request(
            f"{base}/v1/edit",
            {
                "instruction": "make it blue",
                "image": _png_b64(),
                "steps": 4,
                "seed": 7,
            },
        )
        assert status == 200
        assert body["request_id"] and body["latency_ms"] >= 0
        out = Image.open(io.BytesIO(base64.b64decode(body["images"][0])))
        assert out.size == (4, 4)
        instruction, image, kw = rt.edit_calls[-1]
        assert instruction == "make it blue"
        assert image.size == (8, 8)
        assert kw["steps"] == 4 and kw["seed"] == 7

    def test_edit_multi_image_and_n_samples(self, stub_server):
        rt, base = stub_server
        status, body = _request(
            f"{base}/v1/edit",
            {
                "instruction": "combine",
                "images": [_png_b64(), _png_b64((16, 16))],
                "num_images_per_prompt": 2,
            },
        )
        assert status == 200 and len(body["images"]) == 2
        _, image, _ = rt.edit_calls[-1]
        assert isinstance(image, list) and len(image) == 2

    def test_chat_routes_text_and_image(self, stub_server):
        _, base = stub_server
        status, body = _request(
            f"{base}/v1/chat", {"message": "what is this?"}
        )
        assert status == 200
        assert body == dict(body, type="text", text="echo: what is this?")
        status, body = _request(
            f"{base}/v1/chat", {"message": "edit it", "image": _png_b64()}
        )
        assert status == 200 and body["type"] == "image"

    def test_chat_forwards_edit_kwargs(self, stub_server):
        rt, base = stub_server
        seen = {}
        orig = rt.chat
        rt.chat = lambda m, image=None, **kw: (
            seen.update(kw) or orig(m, image)
        )
        try:
            _request(f"{base}/v1/chat",
                     {"message": "go", "image": _png_b64(),
                      "steps": 5, "seed": 11})
            assert seen["steps"] == 5 and seen["seed"] == 11
        finally:
            rt.chat = orig

    def test_chat_forwards_text_kwargs(self, stub_server):
        rt, base = stub_server
        seen = {}
        orig = rt.chat
        rt.chat = lambda m, image=None, **kw: (
            seen.update(kw) or orig(m, image)
        )
        try:
            _request(f"{base}/v1/chat",
                     {"message": "describe", "do_sample": True,
                      "temperature": 0.7, "top_k": 40, "top_p": 0.9,
                      "max_new_tokens": 32})
            assert seen == {"do_sample": True, "temperature": 0.7,
                            "top_k": 40, "top_p": 0.9, "max_new_tokens": 32}
        finally:
            rt.chat = orig

    @pytest.mark.parametrize(
        "payload,frag",
        [
            ({"temperature": 0}, "temperature"),
            ({"temperature": -1.0}, "temperature"),
            ({"top_p": 0}, "top_p"),
            ({"top_p": 1.5}, "top_p"),
            ({"top_k": -2}, "top_k"),
            ({"do_sample": "yes"}, "boolean"),
            ({"max_new_tokens": 0}, "max_new_tokens"),
        ],
    )
    def test_bad_text_kwargs_400(self, stub_server, payload, frag):
        _, base = stub_server
        with pytest.raises(urllib.error.HTTPError) as ei:
            _request(f"{base}/v1/chat", {"message": "x", **payload})
        assert ei.value.code == 400
        assert frag in json.loads(ei.value.read())["error"]

    @pytest.mark.parametrize(
        "payload,frag",
        [
            ({}, "instruction"),
            ({"instruction": "x", "image": "!!notb64!!"}, "invalid image"),
            ({"instruction": "x", "steps": 0}, "steps"),
            ({"instruction": "x", "num_images_per_prompt": 99}, "num_images"),
            ({"instruction": "x", "stream": "false"}, "boolean"),
        ],
    )
    def test_bad_requests_400(self, stub_server, payload, frag):
        _, base = stub_server
        with pytest.raises(urllib.error.HTTPError) as ei:
            _request(f"{base}/v1/edit", payload)
        assert ei.value.code == 400
        assert frag in json.loads(ei.value.read())["error"]

    def test_streaming_edit_sse(self, stub_server):
        _, base = stub_server
        req = urllib.request.Request(
            f"{base}/v1/edit",
            data=json.dumps(
                {"instruction": "go", "steps": 3, "stream": True}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "text/event-stream"
            raw = r.read().decode()
        events = []
        for block in raw.strip().split("\n\n"):
            lines = dict(l.split(": ", 1) for l in block.splitlines())
            events.append((lines["event"], json.loads(lines["data"])))
        steps = [d["step"] for e, d in events if e == "step"]
        assert steps == [0, 1, 2]
        assert all(d["total"] == 3 for e, d in events if e == "step")
        final = events[-1]
        assert final[0] == "result"
        assert final[1]["images"] and final[1]["request_id"]

    def test_streaming_edit_error_event(self, stub_server):
        rt, base = stub_server
        orig = rt.edit
        rt.edit = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("mid-flight"))
        try:
            req = urllib.request.Request(
                f"{base}/v1/edit",
                data=json.dumps({"instruction": "x", "stream": True}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                raw = r.read().decode()
            assert "event: error" in raw and "mid-flight" in raw
        finally:
            rt.edit = orig

    def test_unknown_route_404(self, stub_server):
        _, base = stub_server
        with pytest.raises(urllib.error.HTTPError) as ei:
            _request(f"{base}/nope")
        assert ei.value.code == 404

    def test_runtime_error_500(self, stub_server):
        rt, base = stub_server
        orig = rt.edit
        rt.edit = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom"))
        try:
            with pytest.raises(urllib.error.HTTPError) as ei:
                _request(f"{base}/v1/edit", {"instruction": "x"})
            assert ei.value.code == 500
            assert "boom" in json.loads(ei.value.read())["error"]
        finally:
            rt.edit = orig

    def test_queue_timeout_504(self):
        release = threading.Event()

        class SlowRuntime(StubRuntime):
            def edit(self, instruction, image=None, **kw):
                release.wait(10)
                return Image.new("RGB", (4, 4))

        server = ApiServer(
            SlowRuntime(), "127.0.0.1", 0, queue_timeout_s=0.2
        )
        server.start()
        host, port = server.address[:2]
        base = f"http://{host}:{port}"
        try:
            codes = []

            def fire():
                try:
                    codes.append(
                        _request(f"{base}/v1/edit", {"instruction": "x"})[0]
                    )
                except urllib.error.HTTPError as e:
                    codes.append(e.code)

            t1 = threading.Thread(target=fire)  # occupies the worker
            t2 = threading.Thread(target=fire)  # expires in queue -> 504
            t1.start()
            time.sleep(0.1)
            t2.start()
            time.sleep(0.5)  # let t2's deadline lapse while t1 blocks
            release.set()
            t1.join(15)
            t2.join(15)
            assert sorted(codes) == [200, 504]
        finally:
            server.shutdown()

    def test_backpressure_503(self):
        release = threading.Event()

        class SlowRuntime(StubRuntime):
            def edit(self, instruction, image=None, **kw):
                release.wait(10)
                return Image.new("RGB", (4, 4))

        server = ApiServer(SlowRuntime(), "127.0.0.1", 0, max_queue=1)
        server.start()
        host, port = server.address[:2]
        base = f"http://{host}:{port}"
        try:
            results = []

            def fire():
                try:
                    results.append(_request(f"{base}/v1/edit",
                                            {"instruction": "x"})[0])
                except urllib.error.HTTPError as e:
                    results.append(e.code)

            threads = [threading.Thread(target=fire) for _ in range(4)]
            for t in threads:
                t.start()
                time.sleep(0.1)  # deterministic arrival order
            release.set()
            for t in threads:
                t.join(15)
            # 1 executing + 1 queued succeed; the rest bounce with 503
            assert sorted(results) == [200, 200, 503, 503]
        finally:
            server.shutdown()


# ---------------------------------------------------------------------------
# executor batching contract
# ---------------------------------------------------------------------------
class TestRuntimeExecutor:
    def test_uses_edit_batch_for_same_signature_group(self):
        calls = {}

        class BatchRuntime(StubRuntime):
            def edit_batch(self, reqs):
                calls["n"] = len(reqs)
                return [Image.new("RGB", (4, 4)) for _ in reqs]

        from gpt_image_edit_tpu.serve.scheduler import Job

        ex = RuntimeExecutor(BatchRuntime())
        jobs = [
            Job(request={"kind": "edit",
                         "body": {"instruction": f"p{i}", "images": []}},
                signature="s")
            for i in range(3)
        ]
        out = ex(jobs)
        assert calls["n"] == 3 and len(out) == 3
        assert all("images" in r for r in out)

    def test_single_job_uses_plain_edit(self):
        rt = StubRuntime()
        from gpt_image_edit_tpu.serve.scheduler import Job

        ex = RuntimeExecutor(rt)
        out = ex([Job(request={"kind": "edit",
                               "body": {"instruction": "p", "images": []}})])
        assert len(out) == 1 and rt.edit_calls


class TestExecutorSerialFallback:
    def test_falls_back_when_edit_batch_rejects(self):
        from gpt_image_edit_tpu.serve.scheduler import Job

        class PickyRuntime(StubRuntime):
            def edit_batch(self, reqs):
                raise ValueError("incompatible shapes")

        rt = PickyRuntime()
        ex = RuntimeExecutor(rt)
        jobs = [
            Job(request={"kind": "edit",
                         "body": {"instruction": f"p{i}", "images": []}},
                signature="s")
            for i in range(2)
        ]
        out = ex(jobs)
        assert len(out) == 2 and len(rt.edit_calls) == 2  # ran serially

    def test_reject_resets_staging_before_serial_retry(self):
        """A mid-pipeline reject can leave offloaded components staged
        (FLUX resident, VLM evicted); the serial retry must start from an
        empty-HBM baseline or the VLM re-stage OOMs (observed on one 16GB
        chip in the max_batch=2 serving bench)."""
        from gpt_image_edit_tpu.serve.scheduler import Job

        order = []

        class StagedRuntime(StubRuntime):
            def edit_batch(self, reqs):
                order.append("batch")
                raise ValueError("lowering failed mid-pipeline")

            def reset_staging(self):
                order.append("reset")

            def edit(self, **kw):
                order.append("edit")
                return super().edit(**kw)

        ex = RuntimeExecutor(StagedRuntime())
        jobs = [
            Job(request={"kind": "edit",
                         "body": {"instruction": f"p{i}", "images": []}},
                signature="s")
            for i in range(2)
        ]
        out = ex(jobs)
        assert len(out) == 2
        assert order == ["batch", "reset", "edit", "edit"]


# ---------------------------------------------------------------------------
# client SDK over the stub server
# ---------------------------------------------------------------------------
class TestApiClient:
    def _client(self, stub_server):
        from gpt_image_edit_tpu.serve.client import ApiClient

        _, base = stub_server
        return ApiClient(base, timeout=60)

    def test_health_stats_metrics(self, stub_server):
        c = self._client(stub_server)
        assert c.healthz()["status"] == "ok"
        assert "served" in c.stats()
        assert "gie_served" in c.metrics()

    def test_edit_roundtrip(self, stub_server):
        rt, _ = stub_server
        c = self._client(stub_server)
        img = Image.new("RGB", (8, 8), (1, 2, 3))
        outs = c.edit("do it", [img], steps=2, seed=9)
        assert len(outs) == 1 and outs[0].size == (4, 4)
        _, sent, kw = rt.edit_calls[-1]
        assert sent.size == (8, 8) and kw["steps"] == 2

    def test_edit_stream_progress(self, stub_server):
        c = self._client(stub_server)
        steps = []
        outs = c.edit_stream(
            "go", steps=3, on_step=lambda i, n: steps.append((i, n))
        )
        assert steps == [(0, 3), (1, 3), (2, 3)]
        assert len(outs) == 1

    def test_chat_text_and_image(self, stub_server):
        c = self._client(stub_server)
        out = c.chat("hello?")
        assert out["type"] == "text" and out["text"] == "echo: hello?"
        out = c.chat("edit", Image.new("RGB", (8, 8)))
        assert out["type"] == "image" and out["images"][0].size == (4, 4)

    def test_error_mapping(self, stub_server):
        from gpt_image_edit_tpu.serve.client import ApiClientError

        c = self._client(stub_server)
        with pytest.raises(ApiClientError) as ei:
            c.edit("")  # empty instruction -> 400
        assert ei.value.status == 400 and "instruction" in ei.value.message


class TestConversations:
    def test_lifecycle_and_session_isolation(self, stub_server):
        _, base = stub_server
        _, a = _request(f"{base}/v1/conversations", {})
        _, b = _request(f"{base}/v1/conversations", {})
        cid_a, cid_b = a["conversation_id"], b["conversation_id"]
        assert cid_a != cid_b

        # A gets an image turn; B stays text-only
        status, ra = _request(
            f"{base}/v1/conversations/{cid_a}",
            {"message": "edit it", "image": _png_b64()},
        )
        assert status == 200 and ra["type"] == "image"
        assert ra["conversation_id"] == cid_a
        status, rb1 = _request(
            f"{base}/v1/conversations/{cid_b}", {"message": "hello"}
        )
        # isolation: B's history has no images (A's must not leak) and its
        # transcript is turn 1
        assert rb1["type"] == "text" and rb1["text"].startswith("turn 1")
        status, rb2 = _request(
            f"{base}/v1/conversations/{cid_b}", {"message": "again"}
        )
        assert rb2["text"].startswith("turn 3")  # user+assistant per turn

        # delete -> subsequent turns 404
        req = urllib.request.Request(
            f"{base}/v1/conversations/{cid_a}", method="DELETE"
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 200
        with pytest.raises(urllib.error.HTTPError) as ei:
            _request(f"{base}/v1/conversations/{cid_a}", {"message": "x"})
        assert ei.value.code == 404

    def test_unknown_conversation_404(self, stub_server):
        _, base = stub_server
        with pytest.raises(urllib.error.HTTPError) as ei:
            _request(f"{base}/v1/conversations/nope", {"message": "x"})
        assert ei.value.code == 404

    def test_turn_forwards_text_kwargs(self, stub_server):
        rt, base = stub_server
        _, c = _request(f"{base}/v1/conversations", {})
        seen = {}
        orig = rt.chat_turn
        rt.chat_turn = lambda m, new_images=None, **kw: (
            seen.update(kw) or orig(m, new_images)
        )
        try:
            _request(
                f"{base}/v1/conversations/{c['conversation_id']}",
                {"message": "describe", "do_sample": True,
                 "temperature": 0.6, "top_p": 0.95, "max_new_tokens": 16},
            )
            assert seen == {"do_sample": True, "temperature": 0.6,
                            "top_p": 0.95, "max_new_tokens": 16}
        finally:
            rt.chat_turn = orig

    def test_keepalive_connection_survives_unread_bodies(self, stub_server):
        """Responding before reading the body must not leave bytes on a
        keep-alive connection (they'd be parsed as the next request)."""
        import http.client

        _, base = stub_server
        host, port = base.replace("http://", "").split(":")
        conn = http.client.HTTPConnection(host, int(port), timeout=30)
        try:
            # create ignores its body — the '{}' must still be drained
            conn.request("POST", "/v1/conversations", b"{}",
                         {"Content-Type": "application/json"})
            r1 = conn.getresponse()
            cid = json.loads(r1.read())["conversation_id"]
            assert r1.status == 200
            # SAME connection: the next request must parse cleanly
            conn.request("POST", f"/v1/conversations/{cid}",
                         json.dumps({"message": "hi"}).encode(),
                         {"Content-Type": "application/json"})
            r2 = conn.getresponse()
            assert r2.status == 200
            assert json.loads(r2.read())["type"] == "text"
        finally:
            conn.close()

    def test_rejects_unsupported_turn_fields(self, stub_server):
        _, base = stub_server
        _, c = _request(f"{base}/v1/conversations", {})
        with pytest.raises(urllib.error.HTTPError) as ei:
            _request(
                f"{base}/v1/conversations/{c['conversation_id']}",
                {"message": "x", "true_cfg_scale": 4.0},
            )
        assert ei.value.code == 400
        assert "not supported" in json.loads(ei.value.read())["error"]

    def test_failed_turn_rolls_back_session(self, stub_server):
        rt, base = stub_server
        _, c = _request(f"{base}/v1/conversations", {})
        cid = c["conversation_id"]
        _request(f"{base}/v1/conversations/{cid}", {"message": "turn one"})
        orig = rt.chat_turn

        def boom(message, new_images=None, **kw):
            rt.conversation.append({"from": "user", "value": message})
            raise RuntimeError("mid-turn failure")

        rt.chat_turn = boom
        try:
            with pytest.raises(urllib.error.HTTPError) as ei:
                _request(f"{base}/v1/conversations/{cid}", {"message": "bad"})
            assert ei.value.code == 500
        finally:
            rt.chat_turn = orig
        # retry succeeds and the transcript holds turns 1 + this one only
        _, out = _request(
            f"{base}/v1/conversations/{cid}", {"message": "turn two"}
        )
        assert out["text"].startswith("turn 3")  # user+assistant per turn


class TestApiKeyAuth:
    def test_bearer_required_and_accepted(self):
        from gpt_image_edit_tpu.serve.client import ApiClient, ApiClientError

        server = ApiServer(StubRuntime(), "127.0.0.1", 0, api_key="s3cret")
        server.start()
        host, port = server.address[:2]
        base = f"http://{host}:{port}"
        try:
            # open endpoints stay open
            _request(f"{base}/healthz")
            with urllib.request.urlopen(f"{base}/metrics", timeout=30) as r:
                assert r.status == 200
            # model endpoints reject missing/wrong keys
            with pytest.raises(ApiClientError) as ei:
                ApiClient(base).edit("x")
            assert ei.value.status == 401
            with pytest.raises(ApiClientError) as ei:
                ApiClient(base, api_key="wrong").stats()
            assert ei.value.status == 401
            # and accept the right one (plain + streaming + stats)
            good = ApiClient(base, api_key="s3cret")
            assert good.stats()["served"] == 0
            assert len(good.edit("x")) == 1
            assert len(good.edit_stream("x", steps=2)) == 1
        finally:
            server.shutdown()


# ---------------------------------------------------------------------------
# batched sampling through the real tiny runtime
# ---------------------------------------------------------------------------
import numpy as np  # noqa: E402


@pytest.fixture(scope="module")
def tiny_rt():
    from gpt_image_edit_tpu.serve.runtime import UnivaRuntime

    return UnivaRuntime(tiny=True)


class TestEditBatch:
    def test_matches_solo_outputs(self, tiny_rt):
        img = Image.new("RGB", (32, 32), (120, 40, 200))
        reqs = [
            {"instruction": "make it red", "image": img,
             "steps": 2, "seed": 3},
            {"instruction": "repaint the entire sky in a warm golden hue "
                            "while keeping the foreground untouched",
             "image": img, "steps": 2, "seed": 9},
        ]
        solo = [tiny_rt.edit(**r) for r in reqs]
        batched = tiny_rt.edit_batch([dict(r) for r in reqs])
        assert len(batched) == 2
        for s, b in zip(solo, batched):
            a = np.asarray(s, dtype=np.int16)
            c = np.asarray(b, dtype=np.int16)
            assert a.shape == c.shape
            # text padding is mask-inert; only XLA summation-order noise
            assert np.abs(a - c).max() <= 2

    def test_num_images_per_prompt_matches_solo(self, tiny_rt):
        reqs = [
            {"instruction": f"prompt {i}", "steps": 1, "seed": 10 + i,
             "num_images_per_prompt": 2}
            for i in range(2)
        ]
        solo0 = tiny_rt.edit(**reqs[0])
        out = tiny_rt.edit_batch([dict(r) for r in reqs])
        assert len(out) == 2 and all(len(g) == 2 for g in out)
        # per-request noise is drawn exactly as the solo path draws it
        for s, b in zip(solo0, out[0]):
            diff = np.abs(np.asarray(s, np.int16) - np.asarray(b, np.int16))
            assert diff.max() <= 2
        # the two samples of one request use distinct noise rows
        assert not np.array_equal(np.asarray(out[0][0]), np.asarray(out[0][1]))

    def test_multi_ref_batch(self, tiny_rt):
        refs = [Image.new("RGB", (32, 32), c) for c in ((255, 0, 0), (0, 0, 255))]
        reqs = [
            {"instruction": "merge them", "image": refs, "steps": 1, "seed": 1},
            {"instruction": "blend the two references", "image": refs,
             "steps": 1, "seed": 2},
        ]
        solo = [tiny_rt.edit(**r) for r in reqs]
        out = tiny_rt.edit_batch([dict(r) for r in reqs])
        for s, b in zip(solo, out):
            diff = np.abs(np.asarray(s, np.int16) - np.asarray(b, np.int16))
            # joint multi-ref sequence is longer -> a bit more bf16
            # summation-order noise than the single-ref case
            assert diff.max() <= 5 and diff.mean() <= 0.5

    def test_incompatible_static_config_raises(self, tiny_rt):
        with pytest.raises(ValueError, match="identical steps"):
            tiny_rt.edit_batch([
                {"instruction": "a", "steps": 1},
                {"instruction": "b", "steps": 2},
            ])

    def test_mixed_cond_raises(self, tiny_rt):
        with pytest.raises(ValueError, match="reference buckets"):
            tiny_rt.edit_batch([
                {"instruction": "a", "steps": 1,
                 "image": Image.new("RGB", (32, 32))},
                {"instruction": "b", "steps": 1},
            ])

    def test_single_request_delegates(self, tiny_rt):
        out = tiny_rt.edit_batch([{"instruction": "solo", "steps": 1, "seed": 0}])
        assert len(out) == 1 and out[0].mode == "RGB"

    def test_seeded_request_does_not_pollute_shared_rng(self, tiny_rt):
        import jax

        before = jax.random.key_data(tiny_rt.rng).copy()
        tiny_rt._prep_edit("seeded", seed=1234)
        assert (jax.random.key_data(tiny_rt.rng) == before).all()
        tiny_rt._prep_edit("unseeded")  # only unseeded draws advance it
        assert not (jax.random.key_data(tiny_rt.rng) == before).all()

    def test_incompatible_shapes_rejected_before_prefill(self, tiny_rt, monkeypatch):
        def boom(*a, **k):
            raise AssertionError("VLM prefill ran before the host shape check")

        monkeypatch.setattr(tiny_rt, "_encode_prompt", boom)
        with pytest.raises(ValueError, match="reference buckets"):
            tiny_rt.edit_batch([
                {"instruction": "a", "steps": 1,
                 "image": Image.new("RGB", (32, 32))},
                {"instruction": "b", "steps": 1},
            ])

    def test_negative_prompt_ignored_without_cfg(self, tiny_rt):
        # cfg off: differing negative prompts are NOT a batch splitter
        out = tiny_rt.edit_batch([
            {"instruction": "a", "steps": 1, "seed": 0,
             "negative_prompt": "one"},
            {"instruction": "b", "steps": 1, "seed": 1,
             "negative_prompt": "two"},
        ])
        assert len(out) == 2


class TestEditSignature:
    def _parse(self, payload):
        from gpt_image_edit_tpu.serve.api_server import _parse_edit_request

        return _parse_edit_request(payload)

    def test_distinct_cfg_scales_do_not_coalesce(self):
        from gpt_image_edit_tpu.serve.api_server import edit_signature

        a = edit_signature(self._parse({"instruction": "x", "true_cfg_scale": 2.0}))
        b = edit_signature(self._parse({"instruction": "x", "true_cfg_scale": 3.0}))
        assert a != b

    def test_negative_prompt_only_matters_with_cfg(self):
        from gpt_image_edit_tpu.serve.api_server import edit_signature

        no_cfg_a = edit_signature(
            self._parse({"instruction": "x", "negative_prompt": "one"})
        )
        no_cfg_b = edit_signature(
            self._parse({"instruction": "y", "negative_prompt": "two"})
        )
        assert no_cfg_a == no_cfg_b
        cfg_a = edit_signature(self._parse(
            {"instruction": "x", "true_cfg_scale": 2.0, "negative_prompt": "one"}
        ))
        cfg_b = edit_signature(self._parse(
            {"instruction": "x", "true_cfg_scale": 2.0, "negative_prompt": "two"}
        ))
        assert cfg_a != cfg_b


# ---------------------------------------------------------------------------
# end-to-end through the real tiny runtime
# ---------------------------------------------------------------------------
class TestTinyRuntimeIntegration:
    def test_edit_over_http(self, tiny_rt):
        with ApiServer(tiny_rt, "127.0.0.1", 0) as server:
            host, port = server.address[:2]
            status, body = _request(
                f"http://{host}:{port}/v1/edit",
                {
                    "instruction": "redden the sky",
                    "image": _png_b64((32, 32)),
                    "steps": 2,
                    "seed": 0,
                },
            )
            assert status == 200
            img = Image.open(io.BytesIO(base64.b64decode(body["images"][0])))
            assert img.size[0] > 0 and img.mode == "RGB"

    def test_multi_turn_conversation_real_runtime(self, tiny_rt):
        from gpt_image_edit_tpu.serve.client import ApiClient

        with ApiServer(tiny_rt, "127.0.0.1", 0) as server:
            host, port = server.address[:2]
            c = ApiClient(f"http://{host}:{port}", timeout=600)
            cid = c.create_conversation()
            t1 = c.chat_turn(
                cid, "make it red",
                [Image.new("RGB", (32, 32), (10, 10, 10))],
                steps=1, seed=0,
            )
            assert t1["type"] == "image"
            # turn 2: no new image — conditions on [input, turn-1 output]
            t2 = c.chat_turn(cid, "now bluer", steps=1, seed=1)
            assert t2["type"] == "image"
            c.delete_conversation(cid)
            # the runtime's own chat state was not clobbered between jobs
            assert tiny_rt.conversation == [] and tiny_rt.history_images == []

    def test_streaming_edit_real_scan_callback(self, tiny_rt):
        # the real path: jax.debug.callback inside the lax.scan feeds the
        # SSE sink through the one stable module-level callback
        with ApiServer(tiny_rt, "127.0.0.1", 0) as server:
            host, port = server.address[:2]
            req = urllib.request.Request(
                f"http://{host}:{port}/v1/edit",
                data=json.dumps(
                    {"instruction": "stream it", "steps": 2,
                     "seed": 4, "stream": True}
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                raw = r.read().decode()
        events = []
        for block in raw.strip().split("\n\n"):
            lines = dict(l.split(": ", 1) for l in block.splitlines())
            events.append((lines["event"], json.loads(lines["data"])))
        steps = [d["step"] for e, d in events if e == "step"]
        assert steps == [0, 1]
        assert events[-1][0] == "result" and events[-1][1]["images"]


# ---------------------------------------------------------------------------
# device-fault latching: a poisoned JAX client must flip /healthz to 503
# (a TPU worker crash or an axon RESOURCE_EXHAUSTED is unrecoverable
# in-process — the orchestrator has to restart the replica; observed in the
# max_batch=2 serving bench, 2026-08-20)
# ---------------------------------------------------------------------------
class TestDeviceFault:
    def test_fatal_marker_latches_scheduler(self):
        def ex(jobs):
            raise RuntimeError(
                "UNAVAILABLE: TPU worker process crashed or restarted. "
                "This can be caused by a kernel fault."
            )

        s = DeviceScheduler(ex)
        try:
            with pytest.raises(RuntimeError, match="worker process crashed"):
                s.submit(1).result(5)
            assert "worker process crashed" in s.device_fault
            assert "worker process crashed" in s.stats()["device_fault"]
        finally:
            s.shutdown()

    def test_ordinary_error_does_not_latch(self):
        def ex(jobs):
            raise ValueError("one bad request")

        s = DeviceScheduler(ex)
        try:
            with pytest.raises(ValueError):
                s.submit(1).result(5)
            assert s.device_fault is None
        finally:
            s.shutdown()

    def test_healthz_flips_to_503(self):
        class CrashRuntime(StubRuntime):
            def edit(self, instruction, image=None, **kw):
                raise RuntimeError(
                    "UNAVAILABLE: TPU worker process crashed or restarted."
                )

        server = ApiServer(CrashRuntime(), "127.0.0.1", 0)
        server.start()
        try:
            host, port = server.address[:2]
            base = f"http://{host}:{port}"
            status, body = _request(f"{base}/healthz")
            assert status == 200 and body["status"] == "ok"
            with pytest.raises(urllib.error.HTTPError) as ei:
                _request(f"{base}/v1/edit",
                         {"instruction": "x", "image": _png_b64()})
            assert ei.value.code == 500
            with pytest.raises(urllib.error.HTTPError) as ei:
                _request(f"{base}/healthz")
            assert ei.value.code == 503
            body = json.loads(ei.value.read())
            assert body["status"] == "device_fault"
            assert "worker process crashed" in body["device_fault"]
            # metrics export the fault as a 0/1 gauge
            req = urllib.request.Request(f"{base}/metrics")
            with urllib.request.urlopen(req, timeout=30) as r:
                text = r.read().decode()
            assert "gie_device_fault 1" in text
        finally:
            server.shutdown()


class TestOffloadCoalesceGuard:
    """Under --offload on a single chip, coalesced batches crash the TPU
    worker (measured: B=2 1024^2 scan, serving bench 2026-08-20) and bs=2
    is 18% worse per image — edit_batch must reject multi-request groups
    with ValueError so the executor's serial fallback handles them."""

    class _Stub:
        offload = True

        def edit(self, **kw):
            return f"solo:{kw['instruction']}"

    def test_rejects_multi_request_batch_under_offload(self, monkeypatch):
        from gpt_image_edit_tpu.serve.runtime import UnivaRuntime

        monkeypatch.delenv("GIE_OFFLOAD_COALESCE", raising=False)
        stub = self._Stub()
        reqs = [{"instruction": "a"}, {"instruction": "b"}]
        with pytest.raises(ValueError, match="coalesced batches"):
            UnivaRuntime.edit_batch(stub, reqs)
        # single-request groups still take the solo path
        assert UnivaRuntime.edit_batch(stub, reqs[:1]) == ["solo:a"]

    def test_env_reenables_for_experiments(self, monkeypatch):
        from gpt_image_edit_tpu.serve.runtime import UnivaRuntime

        monkeypatch.setenv("GIE_OFFLOAD_COALESCE", "1")
        stub = self._Stub()
        # past the guard, a duck-typed stub fails later (no _static fields
        # needed: identical empty statics), proving the guard is bypassed
        reqs = [{"instruction": "a"}, {"instruction": "b"}]
        try:
            UnivaRuntime.edit_batch(stub, reqs)
        except ValueError as e:  # pragma: no cover - must not be the guard
            assert "coalesced batches" not in str(e)
        except AttributeError:
            pass  # reached the real batching code on a stub — guard bypassed
