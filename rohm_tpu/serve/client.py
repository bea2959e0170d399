"""Client side of the resident server (import-light: never imports jax, so a
client invocation that only relays a request stays <100 ms of python)."""

from __future__ import annotations

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
    from rohm_tpu.serve import DEFAULT_SOCKET

    socket_path = socket_path or DEFAULT_SOCKET
    if not os.path.exists(socket_path):
        return False
    try:
        return bool(_request({"op": "ping"}, socket_path, 5.0).get("ok"))
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
    """Ping the daemon; spawn a detached one if absent and wait until it
    answers (the spawn pays jax/TPU init, up to minutes over a tunnel).

    A lockfile serializes concurrent spawns: two clients starting inside the
    boot window would otherwise each Popen a daemon, and the loser's socket
    unlink would orphan the winner (both fighting over a single-process TPU).
    """
    from rohm_tpu.serve import DEFAULT_SOCKET

    socket_path = socket_path or DEFAULT_SOCKET
    if server_alive(socket_path):
        return
    lock_path = socket_path + ".spawn_lock"
    got_lock = False
    try:
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            got_lock = True
        except FileExistsError:
            # someone else is booting the daemon — unless their lock is stale
            # (older than the boot window), just wait for it below
            try:
                if time.time() - os.path.getmtime(lock_path) > start_timeout:
                    os.unlink(lock_path)
                    return ensure_server(socket_path, start_timeout,
                                         idle_timeout, log_path)
            except OSError:
                pass
        if got_lock:
            with open(log_path, "ab") as log:
                subprocess.Popen(
                    [sys.executable, "-m", "rohm_tpu.serve",
                     f"--socket={socket_path}", f"--idle_timeout={idle_timeout}"],
                    stdout=log, stderr=log, start_new_session=True,
                    cwd=os.getcwd(),
                )
        deadline = time.monotonic() + start_timeout
        while time.monotonic() < deadline:
            if server_alive(socket_path):
                return
            time.sleep(1.0)
        raise TimeoutError(
            f"rohm_tpu server did not come up within {start_timeout:.0f}s "
            f"(see {log_path})"
        )
    finally:
        if got_lock:
            import contextlib

            with contextlib.suppress(OSError):
                os.unlink(lock_path)


def run_cli(cmd: str, argv: list[str], socket_path: str | None = None,
            auto_start: bool = True, timeout: float = 3600.0):
    """Run `rohm_tpu.cli.<cmd>.main(argv)` on the resident server; print its
    stdout here and return its return value. Raises RuntimeError with the
    server-side traceback on failure."""
    from rohm_tpu.serve import DEFAULT_SOCKET

    socket_path = socket_path or DEFAULT_SOCKET
    if auto_start:
        ensure_server(socket_path)
    resp = _request(
        {"op": "run", "cmd": cmd, "argv": list(argv), "cwd": os.getcwd()},
        socket_path, timeout,
    )
    if resp.get("stdout"):
        sys.stdout.write(resp["stdout"])
        sys.stdout.flush()
    if not resp.get("ok"):
        raise RuntimeError(f"server-side {cmd} failed:\n{resp.get('error')}")
    return resp.get("result")


def _argv_via_server(argv: list[str]) -> tuple[bool, list[str]]:
    """Cheap scan for a truthy --via_server in argv; returns (found, argv
    with the flag stripped). Self-contained so the relay path never imports
    the heavy CLI/jax stack."""
    truthy = ("true", "1", "yes")
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
    through to the normal (heavy) maybe_via_server path, which still works.

    Returns True when the invocation was handled (relayed); the caller should
    then skip the normal main().
    """
    if os.environ.get("ROHM_TPU_IN_SERVER"):
        return False
    argv = list(sys.argv[1:] if argv is None else argv)
    found, fwd = _argv_via_server(argv)
    if not found:
        return False
    run_cli(cmd, fwd)
    return True
