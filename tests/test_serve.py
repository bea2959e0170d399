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


@pytest.fixture
def daemon(tmp_path):
    """serve() on a tmp socket in a thread; stop via the client on teardown."""
    from rohm_tpu.serve import daemon as sdaemon

    sock_path = str(tmp_path / "srv.sock")
    t = threading.Thread(
        target=sdaemon.serve, args=(sock_path,), kwargs={"idle_timeout": 120.0},
        daemon=True,
    )
    t.start()
    deadline = 50
    import time

    for _ in range(deadline * 10):
        if sclient.server_alive(sock_path):
            break
        time.sleep(0.1)
    else:
        raise TimeoutError("daemon did not come up")
    yield sock_path
    sclient.stop_server(sock_path)
    t.join(timeout=10)


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
    # and one that connects but never sends (must not wedge accept loop: the
    # accepted socket carries a 60 s timeout; we don't wait it out here, just
    # assert the daemon still answers a well-behaved client afterward)
    import time

    time.sleep(0.2)
    assert sclient.server_alive(sock_path)


def test_ensure_server_spawn_lock(tmp_path, monkeypatch):
    """A fresh lockfile makes a second client WAIT instead of spawning; a
    stale one is broken and removed."""
    sock_path = str(tmp_path / "none.sock")
    lock = sock_path + ".spawn_lock"
    spawned = []
    monkeypatch.setattr(
        sclient.subprocess, "Popen", lambda *a, **k: spawned.append(a) or None
    )
    # fresh foreign lock -> no spawn, waits, then times out
    with open(lock, "w") as f:
        f.write("12345")
    with pytest.raises(TimeoutError):
        sclient.ensure_server(sock_path, start_timeout=1.5)
    assert spawned == []
    import os

    assert os.path.exists(lock)  # foreign lock left alone
    # stale foreign lock (older than the boot window) -> broken, we spawn
    os.utime(lock, (1, 1))
    with pytest.raises(TimeoutError):
        sclient.ensure_server(sock_path, start_timeout=1.5)
    assert len(spawned) == 1
    assert not os.path.exists(lock)  # our lock cleaned up on exit
