"""Resident-server tests: protocol framing, flag stripping, and an in-process
daemon serving a real (tiny, synthetic) test_amass_full run with a warm
second request."""

import pickle
import socket
import threading

import numpy as np
import pytest

from rohm_tpu.serve import client as sclient
from rohm_tpu.serve.protocol import recv_msg, send_msg
from rohm_tpu.utils.config import strip_flag


def test_strip_flag_forms():
    argv = ["--a=1", "--via_server=True", "--b", "2"]
    assert strip_flag(argv, "--via_server") == ["--a=1", "--b", "2"]
    argv = ["--via_server", "True", "--a=1"]
    assert strip_flag(argv, "--via_server") == ["--a=1"]
    argv = ["--via_server", "--a=1"]
    assert strip_flag(argv, "--via_server") == ["--a=1"]
    # names that merely share the prefix are untouched
    argv = ["--via_server_x=1"]
    assert strip_flag(argv, "--via_server") == ["--via_server_x=1"]


def test_protocol_roundtrip_large():
    a, b = socket.socketpair()
    payload = {"arr": np.arange(300_000, dtype=np.float32), "s": "x" * 10_000}
    t = threading.Thread(target=lambda: send_msg(a, payload))
    t.start()
    got = recv_msg(b)
    t.join()
    np.testing.assert_array_equal(got["arr"], payload["arr"])
    assert got["s"] == payload["s"]
    a.close(); b.close()


def _start_daemon(sock_path: str, **kwargs):
    """serve() on a tmp socket in a thread; returns the thread once alive."""
    from rohm_tpu.serve import daemon as sdaemon

    kwargs.setdefault("idle_timeout", 120.0)
    t = threading.Thread(
        target=sdaemon.serve, args=(sock_path,), kwargs=kwargs, daemon=True,
    )
    t.start()
    import time

    for _ in range(500):
        if sclient.server_alive(sock_path):
            return t
        time.sleep(0.1)
    raise TimeoutError("daemon did not come up")


@pytest.fixture
def daemon(tmp_path):
    """A live daemon on a tmp socket; stop via the client on teardown.
    serve() sets ROHM_TPU_IN_SERVER process-wide (it assumes its own
    process); restore it so later tests' relay paths are unaffected."""
    import os

    prior = os.environ.get("ROHM_TPU_IN_SERVER")
    sock_path = str(tmp_path / "srv.sock")
    t = _start_daemon(sock_path)
    yield sock_path
    sclient.stop_server(sock_path)
    t.join(timeout=10)
    if prior is None:
        os.environ.pop("ROHM_TPU_IN_SERVER", None)
    else:
        os.environ["ROHM_TPU_IN_SERVER"] = prior


def test_ping_unknown_cmd_and_stop(daemon):
    assert sclient.server_alive(daemon)
    with pytest.raises(RuntimeError, match="unknown cmd"):
        sclient.run_cli("rm_rf", [], socket_path=daemon, auto_start=False)
    # a failing CLI returns the server-side traceback, daemon survives
    with pytest.raises(RuntimeError, match="Traceback"):
        sclient.run_cli(
            "eval_amass_full", ["--saved_data_path=/nonexistent.pkl"],
            socket_path=daemon, auto_start=False,
        )
    assert sclient.server_alive(daemon)


@pytest.mark.slow
def test_served_run_and_warm_hit(daemon, tmp_path, capsys):
    """Two identical served runs: the first builds everything, the second must
    hit the resident-model memo and produce a byte-identical result pickle
    (same seed + preset-free config => same math)."""
    argv = [
        "--synthetic_data=True",
        f"--dataset_root={tmp_path / 'amass'}",
        "--clip_len=17",
        "--batch_size=4",
        "--diffusion_steps_posenet=6",
        "--diffusion_steps_trajnet=4",
        "--mid_dim=64",
        "--latent_dim=32",
        "--load_noise=False",
        "--mask_scheme=lower",
        f"--save_root={tmp_path / 'r1'}",
        "--seed=0",
    ]
    p1 = sclient.run_cli("test_amass_full", argv, socket_path=daemon, auto_start=False)
    out1 = capsys.readouterr().out
    assert "warm hit" not in out1
    argv[-2] = f"--save_root={tmp_path / 'r2'}"
    p2 = sclient.run_cli("test_amass_full", argv, socket_path=daemon, auto_start=False)
    out2 = capsys.readouterr().out
    assert "warm hit: reusing resident models" in out2
    with open(p1, "rb") as f:
        d1 = pickle.load(f)
    with open(p2, "rb") as f:
        d2 = pickle.load(f)
    np.testing.assert_array_equal(
        d1["motion_repr_rec_list"], d2["motion_repr_rec_list"]
    )


def test_argv_via_server_forms():
    f = sclient._argv_via_server
    assert f(["--a=1", "--via_server=True", "--b", "2"]) == (True, ["--a=1", "--b", "2"])
    assert f(["--via_server", "True", "--a=1"]) == (True, ["--a=1"])
    assert f(["--via_server", "--a=1"]) == (True, ["--a=1"])
    assert f(["--via_server=False", "--a=1"]) == (False, ["--a=1"])
    assert f(["--a=1"]) == (False, ["--a=1"])


def test_argv_via_server_truthy_matches_str2bool():
    """The light relay path and the heavy CLI parser must agree on which
    values are truthy, or the same flag value would relay from entry scripts
    but run locally under `python -m rohm_tpu.cli.<cmd>`."""
    from rohm_tpu.utils.config import str2bool

    f = sclient._argv_via_server
    for val in ("true", "True", "1", "yes", "YES", "false", "0", "no", "on"):
        assert f([f"--via_server={val}"])[0] == str2bool(val), val


def test_maybe_relay_light_noops_inside_server(monkeypatch):
    """The env guard must stop in-daemon re-relaying (recursive spawn bug)."""
    monkeypatch.setenv("ROHM_TPU_IN_SERVER", "1")
    assert sclient.maybe_relay_light("test_amass_full", ["--via_server=True"]) is False


def test_daemon_survives_client_disconnect(daemon):
    """A client that hangs up before the reply (Ctrl-C / timeout) must not
    kill the daemon — its warm state is the whole point."""
    sock_path = daemon
    # connect, send a ping, and slam the connection shut without reading
    sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    sock.connect(sock_path)
    send_msg(sock, {"op": "ping"})
    sock.close()
    import time

    time.sleep(0.2)
    assert sclient.server_alive(sock_path)


def test_daemon_unwedges_from_silent_client(tmp_path):
    """A client that connects but never sends must not wedge the (single-
    threaded) accept loop: the accepted socket's recv timeout expires and a
    well-behaved client is then served. Runs a dedicated daemon with the
    timeout shortened from the production 60 s so the test is fast."""
    import os
    import time

    prior = os.environ.get("ROHM_TPU_IN_SERVER")
    sock_path = str(tmp_path / "srv.sock")
    t = _start_daemon(sock_path, conn_recv_timeout=1.0)
    try:
        silent = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        silent.connect(sock_path)  # never send
        try:
            # the daemon is now blocked in recv_msg on the silent conn until
            # its 1 s timeout; an honest ping sent meanwhile queues in the
            # backlog and must get answered shortly after
            t0 = time.monotonic()
            assert sclient.server_alive(sock_path)
            assert time.monotonic() - t0 < 10.0
        finally:
            silent.close()
    finally:
        sclient.stop_server(sock_path)
        t.join(timeout=10)
        if prior is None:
            os.environ.pop("ROHM_TPU_IN_SERVER", None)
        else:
            os.environ["ROHM_TPU_IN_SERVER"] = prior


def test_daemon_process_exists_tracks_owner_flock(daemon, tmp_path):
    """The owner flock distinguishes a live daemon from a dead one."""
    assert sclient.daemon_process_exists(daemon)
    assert not sclient.daemon_process_exists(str(tmp_path / "other.sock"))


def test_second_daemon_refuses_to_displace(daemon, capsys):
    """serve() on an owned socket must exit immediately (owner flock held by
    the incumbent) instead of claiming the device and stealing the socket."""
    from rohm_tpu.serve import daemon as sdaemon

    sdaemon.serve(daemon, idle_timeout=5.0)  # returns, does not serve
    out = capsys.readouterr().out
    assert "live daemon" in out
    assert sclient.server_alive(daemon)  # incumbent untouched


def test_run_failure_paths_return_tracebacks(daemon, tmp_path):
    """chdir/import failures inside a run request must produce an error
    response (traceback), not a replyless closed socket."""
    gone = tmp_path / "gone"
    gone.mkdir()
    gone.rmdir()
    with pytest.raises(RuntimeError, match="FileNotFoundError"):
        from rohm_tpu.serve.protocol import recv_msg as _recv, send_msg as _send

        with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as sock:
            sock.settimeout(30.0)
            sock.connect(daemon)
            _send(sock, {"op": "run", "cmd": "eval_amass_full",
                         "argv": [], "cwd": str(gone)})
            resp = _recv(sock)
        assert resp["ok"] is False
        raise RuntimeError(resp["error"])


def test_ensure_server_waits_on_foreign_spawn_lock(tmp_path, monkeypatch):
    """While another client holds the spawn flock (it is booting the daemon),
    ensure_server must wait, not spawn a second daemon. flock dies with its
    holder, so there is no staleness heuristic to race on."""
    import fcntl
    import os

    sock_path = str(tmp_path / "none.sock")
    spawned = []
    monkeypatch.setattr(
        sclient.subprocess, "Popen", lambda *a, **k: spawned.append(a) or None
    )
    fd = os.open(sock_path + ".spawn_lock", os.O_CREAT | os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX)
    try:
        with pytest.raises(TimeoutError):
            sclient.ensure_server(sock_path, start_timeout=1.5)
        assert spawned == []
    finally:
        os.close(fd)
    # lock released (holder "died") -> the next client acquires it and spawns
    class _FakeProc:
        def poll(self):
            return None  # still booting

    monkeypatch.setattr(
        sclient.subprocess, "Popen",
        lambda *a, **k: spawned.append(a) or _FakeProc(),
    )
    with pytest.raises(TimeoutError):
        sclient.ensure_server(sock_path, start_timeout=1.5)
    assert len(spawned) == 1  # spawned exactly once, then waited


@pytest.mark.slow
def test_ensure_server_real_spawn_roundtrip(tmp_path):
    """The unmocked boot path: ensure_server Popens `python -m rohm_tpu.serve`,
    the daemon acquires the owner flock and binds (on CPU — conftest exports
    JAX_PLATFORMS=cpu, which the child inherits), answers a ping, and releases
    the flock on stop."""
    import time

    sock_path = str(tmp_path / "spawned.sock")
    log_path = str(tmp_path / "server.log")
    sclient.ensure_server(sock_path, start_timeout=120.0, idle_timeout=60.0,
                          log_path=log_path)
    try:
        assert sclient.server_alive(sock_path)
        assert sclient.daemon_process_exists(sock_path)
    finally:
        assert sclient.stop_server(sock_path)
    for _ in range(100):
        if not sclient.daemon_process_exists(sock_path):
            break
        time.sleep(0.1)
    else:
        raise AssertionError("daemon still holds the owner flock after stop")


def test_ensure_server_returns_for_busy_daemon(tmp_path, monkeypatch):
    """A daemon that holds the owner flock but cannot answer pings (it is
    mid-request) must NOT be displaced by a fresh spawn — the request will
    queue in its listener backlog."""
    import fcntl
    import os

    sock_path = str(tmp_path / "busy.sock")
    spawned = []
    monkeypatch.setattr(
        sclient.subprocess, "Popen", lambda *a, **k: spawned.append(a) or None
    )
    # simulate the busy daemon: owner flock held + bound listener that never
    # accepts (exactly what a single-threaded daemon inside _handle_run is)
    fd = os.open(sock_path + ".owner", os.O_CREAT | os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX)
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(sock_path)
    srv.listen(4)
    try:
        sclient.ensure_server(sock_path, start_timeout=5.0)  # returns, no raise
        assert spawned == []
    finally:
        srv.close()
        os.close(fd)


def test_relay_import_is_sitefree():
    """The lowest-latency documented client invocation is `python -S
    entry_script.py --via_server=True ...` (this container's sitecustomize
    imports jax in every python process — 1.84 s measured; the relay itself
    is stdlib-only). Regression-guard that the relay import chain really
    needs no site-packages: a heavy import sneaking into
    rohm_tpu/serve/client.py or the package __init__s would silently break
    the -S path with ImportError at client time."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-S", "-c",
         "import sys; sys.path.insert(0, '.');"
         "from rohm_tpu.serve.client import maybe_relay_light, run_cli;"
         "import rohm_tpu.serve.protocol;"
         "print('SITEFREE-OK', 'site' in sys.modules)"],
        capture_output=True, text=True, cwd=".", timeout=60,
    )
    assert proc.returncode == 0, proc.stderr
    assert "SITEFREE-OK False" in proc.stdout, proc.stdout
