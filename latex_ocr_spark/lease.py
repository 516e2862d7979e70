"""Single-writer lease on a directory of mutable state.

Shared by the resumable funnel's checkpoint dir (plans/resumable.py —
artifact-then-lineage commits assume one writer) and the streaming
near-dedup survivor index's offline maintenance (streaming/
near_dedup.py — two concurrent compactions would both stage and swap
the same table paths).  Both are instances of the visited-file append
race the reference never solved (arxiv.py:126-130): a second
concurrent writer must fail loudly, not corrupt.

Mechanics: ``O_CREAT | O_EXCL`` on ``<dir>/<name>`` (atomic on a
local/POSIX fs) holding {pid, host, started, role}.  A leftover lock
whose owner is verifiably dead — same host, pid gone — is broken and
re-acquired, so a SIGKILLed run doesn't fence out its own retry
forever; a lock owned by a LIVE pid or an unverifiable remote host
always raises (breaking it blind is exactly the race this class
exists to prevent — the operator deletes the file after confirming
the other run is gone).  On an object store, replace with a
conditional-put of the same payload; the protocol is unchanged.
"""

from __future__ import annotations

import json
import os
import socket
import time


class DirLease:
    def __init__(self, state_dir: str, name: str = "_lock",
                 role: str = "writer"):
        self.path = os.path.join(state_dir, name)
        self.role = role
        self._held = False

    def acquire(self) -> "DirLease":
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        payload = json.dumps(
            {"pid": os.getpid(), "host": socket.gethostname(),
             "started": int(time.time()), "role": self.role}
        )
        for _attempt in (1, 2):  # second attempt only after a stale break
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                with os.fdopen(fd, "w") as f:
                    f.write(payload)
                self._held = True
                return self
            except FileExistsError:
                try:
                    with open(self.path) as f:
                        holder = json.load(f)
                except (OSError, ValueError):
                    # mid-write or vanished: treat as held, never break
                    holder = {"pid": None, "host": "?", "started": "?"}
                if (
                    holder.get("host") == socket.gethostname()
                    and isinstance(holder.get("pid"), int)
                    and not _pid_alive(holder["pid"])
                ):
                    # verifiably dead owner (crashed run): break once
                    try:
                        os.unlink(self.path)
                    except FileNotFoundError:
                        pass
                    continue
                raise RuntimeError(
                    f"state dir {os.path.dirname(self.path)} is leased to a "
                    f"running {holder.get('role', 'writer')} (pid "
                    f"{holder.get('pid')} on {holder.get('host')}, started "
                    f"{holder.get('started')}) — a second concurrent writer "
                    "would corrupt it; wait for it or, after confirming it "
                    f"is dead, delete {self.path}"
                )
        raise RuntimeError(f"could not acquire lease {self.path}")

    def release(self) -> None:
        if self._held:
            self._held = False
            try:
                os.unlink(self.path)
            except FileNotFoundError:
                pass

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
