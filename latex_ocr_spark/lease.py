"""Single-writer lease on a directory of mutable state.

Shared by the resumable funnel's checkpoint dir (plans/resumable.py —
artifact-then-lineage commits assume one writer), the streaming
near-dedup survivor index's offline maintenance (streaming/
near_dedup.py — two concurrent compactions would both stage and swap
the same table paths), and the stream itself (maintenance must not
swap partitions under a live reader).  All are instances of the
visited-file append race the reference never solved
(arxiv.py:126-130): a second concurrent writer must fail loudly, not
corrupt.

Mechanics: the mutual exclusion is ``flock(LOCK_EX | LOCK_NB)`` on
``<dir>/<name>`` — the kernel releases the lock the instant the
holding process dies, so there is NO stale-lock breaking step and no
unlink race between two waiters who both judged a holder dead (the
failure mode of the earlier O_EXCL + pid-liveness design: both could
break and both "acquire").  The file additionally carries a JSON
payload {pid, host, started, role} for diagnostics and for the one
case flock cannot arbitrate: a payload written by ANOTHER HOST on
shared storage is never broken — flock visibility across hosts is
filesystem-dependent, so an unverifiable remote holder always
refuses, and the operator deletes the file after confirming the
other run is gone.

Local-filesystem implementation: paths with a URI scheme
(``s3://…``, ``hdfs://…``) are rejected loudly rather than silently
"succeeding" against a nonexistent local directory.  On an object
store, replace with a conditional-put of the same payload; the
protocol is unchanged.
"""

from __future__ import annotations

import errno
import fcntl
import json
import os
import re
import socket
import threading
import time
from typing import Optional, Tuple

_URI_SCHEME = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")


def require_local_path(path: str, what: str) -> None:
    """Loudly reject URI-scheme paths: every filesystem-level safety
    mechanism in this module (flock, rename, rmtree) is local-only,
    and treating ``s3://…`` as a relative local path would make the
    guard silently vanish on exactly the deployment it matters for."""
    if _URI_SCHEME.match(path):
        raise NotImplementedError(
            f"{what} is implemented for local/POSIX filesystems only, got "
            f"{path!r} — on an object store route the same protocol through "
            "the Hadoop FileSystem API (conditional-put lease, per-prefix "
            "deletes); see the module docstrings"
        )


def is_uri_path(path: str) -> bool:
    """True for scheme'd paths (``s3a://…``, ``hdfs://…``, …) that the
    local-fs lease machinery cannot see — callers use this to SKIP the
    fence with a documented note rather than pretend to hold it."""
    return bool(_URI_SCHEME.match(path))


def read_holder(lock_path: str) -> dict:
    """Best-effort parse of a lock file's JSON payload (diagnostics
    only — flock is the actual mutex)."""
    try:
        with open(lock_path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {"pid": None, "host": "?", "started": "?", "role": "writer"}


def _read_holder_fd(fd: int) -> Optional[dict]:
    """Holder payload read through an already-open fd — immune to the
    file being unlinked between open and read.  None when the payload
    is empty/garbage (mid-write crash or a lock mid-release)."""
    try:
        data = os.pread(fd, 1 << 16, 0)
        return json.loads(data) if data else None
    except (OSError, ValueError):
        return None


def probe(state_dir: str, name: str = "_lock") -> Tuple[str, dict]:
    """Non-destructive lease state check for OTHER components' locks
    (e.g. the stream checking the maintenance lock, maintenance
    checking the stream lock).  Returns (state, holder):

    - ``"free"``       — no lock file; a payload-less file with no
      live flock (crashed mid-create, or caught mid-release — the
      same states DirLease.acquire self-heals); or a same-host
      payload with no live flock and a dead pid;
    - ``"held"``       — a live local holder (flock held, or a
      same-host payload whose pid is alive — conservative for
      flock-less files written by hand or older builds);
    - ``"remote"``     — payload from another host: liveness
      unverifiable, treat as held.

    Never modifies the file.  The payload is read through the open fd,
    so a holder releasing (unlink) mid-probe reads as the state it
    left behind, never as a phantom unverifiable holder.
    """
    path = os.path.join(state_dir, name)
    require_local_path(path, "lease probe")
    try:
        fd = os.open(path, os.O_RDONLY)
    except FileNotFoundError:
        return "free", {}
    try:
        try:
            fcntl.flock(fd, fcntl.LOCK_SH | fcntl.LOCK_NB)
            fcntl.flock(fd, fcntl.LOCK_UN)
            flocked = False
        except OSError as e:
            if e.errno not in (errno.EWOULDBLOCK, errno.EAGAIN):
                raise
            flocked = True
        holder = _read_holder_fd(fd)
    finally:
        os.close(fd)
    if flocked:
        return "held", holder or {}
    if holder is None:
        return "free", {}
    if holder.get("host") not in (socket.gethostname(),):
        return "remote", holder
    if isinstance(holder.get("pid"), int) and _pid_alive(holder["pid"]):
        return "held", holder
    return "free", holder


class DirLease:
    def __init__(self, state_dir: str, name: str = "_lock",
                 role: str = "writer"):
        require_local_path(os.path.join(state_dir, name), "DirLease")
        self.path = os.path.join(state_dir, name)
        self.role = role
        self._fd: Optional[int] = None
        # release can race between a caller thread and a streaming
        # termination-listener dispatch thread — the fd pop must be
        # atomic or the loser flocks an already-closed fd
        self._release_mutex = threading.Lock()

    def acquire(self, retry_seconds: float = 0.0) -> "DirLease":
        """Take the lease or raise.  ``retry_seconds`` bounds a retry
        loop for callers racing an asynchronous release (a streaming
        query's termination listener) — 0 means one attempt."""
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        deadline = time.monotonic() + retry_seconds
        while True:
            err = self._try_acquire()
            if err is None:
                return self
            if time.monotonic() >= deadline:
                raise err
            time.sleep(0.1)

    def _try_acquire(self) -> Optional[RuntimeError]:
        for _attempt in range(8):
            fd = os.open(self.path, os.O_CREAT | os.O_RDWR, 0o644)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError as e:
                if e.errno not in (errno.EWOULDBLOCK, errno.EAGAIN):
                    os.close(fd)
                    raise
                holder = read_holder(self.path)
                os.close(fd)
                return RuntimeError(self._held_message(holder))
            # guard the unlink-recreate window: if the path no longer
            # names the inode we flocked (a releasing holder unlinked
            # it between our open and flock), this lock is on an
            # orphaned file — drop it and take the current one
            try:
                same = os.stat(self.path).st_ino == os.fstat(fd).st_ino
            except FileNotFoundError:
                same = False
            if same:
                break
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)
        else:
            raise RuntimeError(
                f"lease {self.path} is being churned faster than it can "
                "be acquired (8 unlink-recreate races in a row)"
            )
        # flock held: the only holder we may NOT supersede is a payload
        # another host wrote (flock can't arbitrate across hosts on
        # every shared filesystem — never break blind)
        holder = read_holder(self.path)
        if (
            holder.get("pid") is not None
            and holder.get("host") != socket.gethostname()
        ):
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)
            return RuntimeError(self._held_message(holder))
        payload = json.dumps(
            {"pid": os.getpid(), "host": socket.gethostname(),
             "started": int(time.time()), "role": self.role}
        ).encode()
        os.ftruncate(fd, 0)
        os.pwrite(fd, payload, 0)
        self._fd = fd
        return None

    def _held_message(self, holder: dict) -> str:
        return (
            f"state dir {os.path.dirname(self.path)} is leased to a "
            f"running {holder.get('role', 'writer')} (pid "
            f"{holder.get('pid')} on {holder.get('host')}, started "
            f"{holder.get('started')}) — a second concurrent writer "
            "would corrupt it; wait for it or, after confirming it is "
            f"dead, delete {self.path}"
        )

    def release(self) -> None:
        with self._release_mutex:
            fd, self._fd = self._fd, None
        if fd is not None:
            try:
                os.unlink(self.path)
            except FileNotFoundError:
                pass
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    def __enter__(self) -> "DirLease":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
