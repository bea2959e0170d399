"""Client side of the resident server (import-light: never imports jax, so a
client invocation that only relays a request stays <100 ms of python)."""

from __future__ import annotations

import fcntl
import os
import socket
import subprocess
import sys
import time


def _connect(socket_path: str, timeout: float = 5.0) -> socket.socket:
    sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    sock.settimeout(timeout)
    sock.connect(socket_path)
    return sock


def _request(msg: dict, socket_path: str, timeout: float):
    from rohm_tpu.serve.protocol import recv_msg, send_msg

    with _connect(socket_path, timeout) as sock:
        send_msg(sock, msg)
        sock.settimeout(timeout)
        return recv_msg(sock)


def server_alive(socket_path: str | None = None) -> bool:
    """True iff a daemon answers a ping — i.e. it is alive AND idle. A daemon
    mid-request cannot answer (single-threaded); see daemon_process_exists
    for the busy-vs-dead distinction."""
    from rohm_tpu.serve import DEFAULT_SOCKET

    socket_path = socket_path or DEFAULT_SOCKET
    if not os.path.exists(socket_path):
        return False
    try:
        return bool(_request({"op": "ping"}, socket_path, 5.0).get("ok"))
    except OSError:
        return False


def daemon_process_exists(socket_path: str | None = None) -> bool:
    """True iff a daemon PROCESS holds the owner flock — even one busy inside
    a multi-minute request that can't answer pings. The kernel releases the
    flock the instant the holder dies, so this never reports a stale owner."""
    from rohm_tpu.serve import DEFAULT_SOCKET

    socket_path = socket_path or DEFAULT_SOCKET
    try:
        fd = os.open(socket_path + ".owner", os.O_CREAT | os.O_RDWR, 0o600)
    except OSError:
        return False
    try:
        # LOCK_SH, not LOCK_EX: a read-only liveness probe must never look
        # like an owner to a booting daemon's LOCK_EX gate (or to another
        # client probing concurrently) — shared locks coexist with each
        # other but fail against the daemon's held exclusive lock.
        fcntl.flock(fd, fcntl.LOCK_SH | fcntl.LOCK_NB)
        fcntl.flock(fd, fcntl.LOCK_UN)
        return False
    except OSError:
        return True
    finally:
        os.close(fd)


def _socket_connectable(socket_path: str) -> bool:
    """A bound listener accepts connects (into the backlog) even while the
    daemon is busy; a booting daemon hasn't bound yet and a dead one's stale
    path refuses."""
    try:
        _connect(socket_path, 2.0).close()
        return True
    except OSError:
        return False


def stop_server(socket_path: str | None = None) -> bool:
    from rohm_tpu.serve import DEFAULT_SOCKET

    socket_path = socket_path or DEFAULT_SOCKET
    if not os.path.exists(socket_path):
        return False
    try:
        return bool(_request({"op": "stop"}, socket_path, 10.0).get("ok"))
    except OSError:
        return False


def ensure_server(
    socket_path: str | None = None, start_timeout: float = 300.0,
    idle_timeout: float = 600.0, log_path: str = "/tmp/rohm_tpu_server.log",
) -> None:
    """Make sure a daemon is reachable: return if one answers a ping OR is
    alive-but-busy (its backlog will queue our request); otherwise spawn a
    detached one and wait until it answers (the spawn pays jax/TPU init, up
    to minutes over a tunnel).

    Spawns are serialized by an flock on `<socket>.spawn_lock` — held for the
    duration of the boot wait and released by the kernel if the spawning
    client dies, so there is no staleness heuristic to race on. A busy LIVE
    daemon is detected via the `.owner` flock the daemon holds for its whole
    life; without that check, a ping timeout against a daemon mid-request
    would spawn a second jax process fighting over the single-process TPU.
    """
    from rohm_tpu.serve import DEFAULT_SOCKET

    socket_path = socket_path or DEFAULT_SOCKET
    if server_alive(socket_path):
        return
    lock_fd = os.open(socket_path + ".spawn_lock", os.O_CREAT | os.O_RDWR, 0o600)
    got_lock = False
    proc = None
    spawns = 0
    try:
        deadline = time.monotonic() + start_timeout
        while True:
            if daemon_process_exists(socket_path):
                if _socket_connectable(socket_path):
                    # alive — idle (would answer a ping) or mid-request (our
                    # request will queue in the listener backlog); spawning
                    # here would duplicate the single-process TPU claim
                    return
                # else: a daemon is booting (flock held, socket not bound
                # yet) — keep waiting for it
            elif not got_lock:
                try:
                    fcntl.flock(lock_fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    got_lock = True
                except OSError:
                    pass  # another client is spawning; wait for its daemon
            if got_lock and not daemon_process_exists(socket_path) and (
                proc is None or proc.poll() is not None
            ):
                if spawns >= 3:
                    raise RuntimeError(
                        f"spawned rohm_tpu server exited {spawns}x without "
                        f"binding {socket_path} (see {log_path})"
                    )
                with open(log_path, "ab") as log:
                    proc = subprocess.Popen(
                        [sys.executable, "-m", "rohm_tpu.serve",
                         f"--socket={socket_path}",
                         f"--idle_timeout={idle_timeout}"],
                        stdout=log, stderr=log, start_new_session=True,
                        cwd=os.getcwd(),
                    )
                spawns += 1
            if time.monotonic() >= deadline:
                raise TimeoutError(
                    f"rohm_tpu server did not come up within "
                    f"{start_timeout:.0f}s (see {log_path})"
                )
            time.sleep(1.0)
    finally:
        os.close(lock_fd)  # releases the spawn flock if we held it


def run_cli(cmd: str, argv: list[str], socket_path: str | None = None,
            auto_start: bool = True, timeout: float = 3600.0):
    """Run `rohm_tpu.cli.<cmd>.main(argv)` on the resident server; print its
    stdout here and return its return value. Raises RuntimeError with the
    server-side traceback on failure."""
    from rohm_tpu.serve import DEFAULT_SOCKET

    socket_path = socket_path or DEFAULT_SOCKET
    msg = {"op": "run", "cmd": cmd, "argv": list(argv), "cwd": os.getcwd()}
    if auto_start:
        ensure_server(socket_path)
    try:
        resp = _request(msg, socket_path, timeout)
    except (ConnectionError, FileNotFoundError) as e:
        # The daemon can idle-exit (or die) between our liveness check and
        # the reply — the connect refuses, or recv_msg EOFs on the drained
        # backlog. One respawn-and-retry is safe: the served CLIs are
        # idempotent (they overwrite their output pickles), and a request
        # the daemon never accepted was never executed at all.
        if not auto_start:
            raise
        print(f"[serve-client] connection lost ({e}); restarting the server "
              "and retrying once", flush=True)
        ensure_server(socket_path)
        resp = _request(msg, socket_path, timeout)
    if resp.get("stdout"):
        sys.stdout.write(resp["stdout"])
        sys.stdout.flush()
    if not resp.get("ok"):
        raise RuntimeError(f"server-side {cmd} failed:\n{resp.get('error')}")
    return resp.get("result")


def _argv_via_server(argv: list[str]) -> tuple[bool, list[str]]:
    """Cheap scan for a truthy --via_server in argv; returns (found, argv
    with the flag stripped). Self-contained so the relay path never imports
    the heavy CLI/jax stack. The truthy set must match utils/config.str2bool
    (the heavy path's parser) or the same flag value would relay from entry
    scripts but run locally under `python -m rohm_tpu.cli.<cmd>`."""
    truthy = ("true", "1")
    out: list[str] = []
    found = False
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--via_server":
            if i + 1 < len(argv) and not argv[i + 1].startswith("-"):
                found = found or argv[i + 1].lower() in truthy
                i += 2
            else:
                found = True
                i += 1
            continue
        if a.startswith("--via_server="):
            found = found or a.split("=", 1)[1].lower() in truthy
            i += 1
            continue
        out.append(a)
        i += 1
    return found, out


def maybe_relay_light(cmd: str, argv: list[str] | None = None) -> bool:
    """Entry-script fast path: if argv carries a truthy --via_server, relay
    the invocation to the resident server WITHOUT importing jax/flax/the CLI
    module (those imports cost multi-second overhead per relayed run). A
    via_server set only in the YAML config is NOT seen here — that case falls
    through to the CLI's normal (heavy) maybe_via_server hook, which every
    server-runnable CLI (the four test_* and two eval_* drivers) declares.

    Returns True when the invocation was handled (relayed); the caller should
    then skip the normal main().
    """
    if os.environ.get("ROHM_TPU_IN_SERVER"):
        return False
    argv = list(sys.argv[1:] if argv is None else argv)
    found, fwd = _argv_via_server(argv)
    if not found:
        return False
    # Latency note: the relay itself is stdlib-only, but interpreter STARTUP
    # can dominate it — this container's sitecustomize registers the axon
    # TPU backend (imports jax) in every python process, 1.84 s measured vs
    # 0.01 s without site processing. That cost is paid before any of our
    # code runs, so it cannot be recovered here; latency-sensitive clients
    # should invoke the entry scripts as `python -S test_amass_full.py
    # --via_server=True ...` (the relay needs no site-packages; the daemon
    # it spawns is a fresh full-site python). Measured warm e2e: client
    # wall 15.1 s -> 13.2 s.
    run_cli(cmd, fwd)
    return True
