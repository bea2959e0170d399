"""The resident-server daemon: accepts CLI requests over a unix socket and
runs them in-process, so jit executables, loaded checkpoints, and the
pipeline's compiled chains stay warm between runs.

Request dicts: {"op": "run", "cmd": <cli name>, "argv": [...], "cwd": str}
              {"op": "ping"} | {"op": "stop"}
Response:     {"ok": bool, "result": ..., "stdout": str, "error": str|None}

One request at a time (the device is serial anyway). Idle auto-exit releases
the TPU: a tunneled chip is single-process, so a forgotten daemon must never
starve training jobs or the benchmark harness.

Liveness protocol: the daemon holds an exclusive flock on
`<socket>.owner` for its entire life. A ping answers only when the daemon is
idle (single-threaded), but the flock is held even mid-request and is
released by the kernel the instant the process dies — so clients (and a
second daemon's displacement guard) can tell "busy" from "dead" without
ever racing a ping timeout into spawning a duplicate TPU process.
"""

from __future__ import annotations

import contextlib
import fcntl
import importlib
import io
import os
import socket
import sys
import time
import traceback

from rohm_tpu.serve import DEFAULT_SOCKET
from rohm_tpu.serve.protocol import encode, recv_msg, send_bytes, send_msg

# inference + eval CLIs benefit from warm executables; the train CLIs are
# long-running processes that amortize startup themselves.
# INVARIANT: every served command must be IDEMPOTENT (safe to run twice with
# the same argv — these all just overwrite their output pickles). The client
# retries a lost connection once by re-sending the request (client.py
# run_cli), which can re-execute a request whose reply was lost mid-send;
# do not add a non-idempotent command here without removing that retry.
ALLOWED_CMDS = (
    "test_amass_full", "test_trajnet", "test_posenet", "test_prox_egobody",
    "eval_amass_full", "eval_prox_egobody",
)


class _Tee(io.TextIOBase):
    """Mirror CLI prints to the daemon log while capturing them for the client."""

    def __init__(self, real):
        self.real = real
        self.buf = io.StringIO()

    def write(self, s):
        self.real.write(s)
        self.buf.write(s)
        return len(s)

    def flush(self):
        self.real.flush()


def _handle_run(req: dict) -> dict:
    cmd = req.get("cmd", "")
    if cmd not in ALLOWED_CMDS:
        return {"ok": False, "result": None, "stdout": "",
                "error": f"unknown cmd {cmd!r}; allowed: {ALLOWED_CMDS}"}
    tee = _Tee(sys.stdout)
    t0 = time.perf_counter()
    result, err, ok = None, None, False
    # everything that can fail (chdir to a deleted client cwd, a CLI module
    # that no longer imports, the run itself) must produce a traceback in the
    # response — a raise before the try would close the socket replyless
    try:
        cwd = req.get("cwd")
        if cwd:
            os.chdir(cwd)
        mod = importlib.import_module(f"rohm_tpu.cli.{cmd}")
        with contextlib.redirect_stdout(tee):
            result = mod.main(req.get("argv", []))
        ok = True
    except KeyboardInterrupt:
        raise  # a foreground daemon must stay Ctrl-C-able mid-request
    except BaseException:  # noqa: BLE001 — survive any CLI failure, incl. argparse SystemExit
        err = traceback.format_exc()
    print(f"[serve] {cmd} finished in {time.perf_counter() - t0:.1f}s ok={ok}",
          flush=True)
    return {"ok": ok, "result": result, "stdout": tee.buf.getvalue(), "error": err}


def serve(socket_path: str = DEFAULT_SOCKET, idle_timeout: float = 600.0,
          conn_recv_timeout: float = 60.0) -> None:
    """Run the daemon until `stop` or idle_timeout seconds without requests."""
    # a CLI running INSIDE the daemon must never relay back out, even if its
    # YAML sets via_server: true (maybe_via_server checks this env guard);
    # without it a config-set flag would recurse into spawning daemons
    os.environ["ROHM_TPU_IN_SERVER"] = "1"

    # Ownership gate, BEFORE any jax import: refuse to displace a live daemon
    # (unlinking its socket would orphan a process holding the single-process
    # TPU, and booting jax here would make us the second claimant — the
    # documented tunnel-wedge failure mode). flock is held even while the
    # incumbent is busy serving, unlike a ping, and dies with its process.
    owner_fd = os.open(socket_path + ".owner", os.O_CREAT | os.O_RDWR, 0o600)
    # Retry briefly: clients' liveness probes take a momentary LOCK_SH on
    # this file (client.daemon_process_exists); a real incumbent holds
    # LOCK_EX for its whole life. A transient probe must not make a booting
    # daemon conclude it was displaced — only a lock still held after ~2 s
    # of retries is a genuine owner.
    for _ in range(40):
        try:
            fcntl.flock(owner_fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except OSError:
            time.sleep(0.05)
    else:
        os.close(owner_fd)
        print(f"[serve] a live daemon (possibly mid-request) owns "
              f"{socket_path}; exiting", flush=True)
        return
    os.ftruncate(owner_fd, 0)
    os.write(owner_fd, str(os.getpid()).encode())
    try:
        _serve_locked(socket_path, idle_timeout, conn_recv_timeout)
    finally:
        os.close(owner_fd)  # releases the flock; the .owner file stays
        # (unlinking it would race a waiter that just opened the same inode)


def _serve_locked(socket_path: str, idle_timeout: float,
                  conn_recv_timeout: float) -> None:
    # warm the backend before accepting: the first client's clock shouldn't
    # include device discovery
    from rohm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

    print(f"[serve] backend={jax.default_backend()} devices={len(jax.devices())}",
          flush=True)

    if os.path.exists(socket_path):
        os.unlink(socket_path)  # dead leftover (we hold the owner flock)
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(socket_path)
    os.chmod(socket_path, 0o700)
    srv.listen(4)
    srv.settimeout(5.0)
    print(f"[serve] listening on {socket_path} (idle_timeout={idle_timeout:.0f}s)",
          flush=True)
    last_req = time.monotonic()
    try:
        while True:
            if time.monotonic() - last_req > idle_timeout:
                # Final drain before exiting: a client that saw the socket
                # connectable just before the deadline may already sit in
                # the listener backlog — closing now would EOF its reply.
                # If anything is queued, serve it (which resets last_req);
                # only an empty backlog ends the daemon.
                try:
                    srv.settimeout(0.0)
                    conn, _ = srv.accept()
                except BlockingIOError:  # the expected empty-backlog signal
                    print("[serve] idle timeout — releasing the device",
                          flush=True)
                    return
                except OSError as e:  # a real accept() failure, not idleness
                    print(f"[serve] accept failed at idle deadline ({e!r}) "
                          "— exiting", flush=True)
                    return
                finally:
                    srv.settimeout(5.0)
            else:
                try:
                    conn, _ = srv.accept()
                except socket.timeout:
                    continue
            with conn:
                # accepted sockets are BLOCKING regardless of the listener's
                # timeout; a silent client must not wedge the daemon (and its
                # idle auto-exit) forever. The default 60 s covers any honest
                # request — clients send immediately after connecting.
                conn.settimeout(conn_recv_timeout)
                try:
                    req = recv_msg(conn)
                except Exception:
                    continue
                last_req = time.monotonic()
                op = req.get("op")
                try:
                    if op == "ping":
                        send_msg(conn, {"ok": True, "pid": os.getpid()})
                    elif op == "stop":
                        send_msg(conn, {"ok": True})
                        print("[serve] stop requested", flush=True)
                        return
                    elif op == "run":
                        resp = _handle_run(req)
                        try:
                            payload = encode(resp)
                        except Exception:
                            # an unpicklable CLI return value must become an
                            # error reply, not a swallowed exception that
                            # leaves the client hanging until its timeout
                            payload = encode({
                                "ok": False, "result": None,
                                "stdout": resp.get("stdout", ""),
                                "error": "CLI result not picklable:\n"
                                         + traceback.format_exc(),
                            })
                        send_bytes(conn, payload)
                        last_req = time.monotonic()
                    else:
                        send_msg(conn, {"ok": False, "error": f"bad op {op!r}"})
                except Exception:
                    # the client hung up (Ctrl-C, its own timeout) while we
                    # were running/sending — the daemon and its warm state
                    # must survive; the work's side effects (saved pickles)
                    # are already on disk
                    print("[serve] client connection lost mid-reply "
                          f"({traceback.format_exc(limit=1).splitlines()[-1]})",
                          flush=True)
                    continue
    finally:
        srv.close()
        with contextlib.suppress(OSError):
            # we hold the owner flock until process/fd teardown, so no other
            # daemon can have rebound the name: the socket path is ours
            os.unlink(socket_path)
