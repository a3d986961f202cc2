"""Committed-XLA-cache size policy (VERDICT r4 #5 / ADVICE r4 medium).

The warm-start executable cache is essential here (the axon remote-compile
relay costs ~20-40 s per XLA compile; round 3's official bench died at
rc=124 compiling cold), but committing the raw cache dir bloated history
(~433 MB tracked, one 148.5 MB file over GitHub's 100 MB hard limit) and
every kernel change stranded stale entries forever.

Policy:
  * the RUNTIME cache ``benchmarks/xla_cache`` is untracked (gitignored);
  * git tracks ``benchmarks/xla_cache_pack/`` — a snapshot where every
    entry is split into <= 90 MB chunks (``<name>.part00``, ...), so no
    tracked file can exceed GitHub's limit;
  * the tracked snapshot is hard-capped at ``CAP_MB`` (500 MB).  ``pack``
    refuses above the cap and tells you to refresh cold;
  * refresh protocol (run after kernel changes, once per round):
        python benchmarks/cache_pack.py refresh   # moves runtime dir aside
        python bench.py                           # cold run: writes ONLY
                                                  # entries the bench needs
        python benchmarks/cache_pack.py pack      # snapshot + prune stale
    A cold refresh is the only reliable liveness oracle: entries the run
    does not compile are stale by construction (read atimes are not
    trustworthy under relatime mounts).

``bench.enable_compile_cache`` calls :func:`unpack` automatically, so a
fresh clone still starts warm.
"""

from __future__ import annotations

import os
import shutil
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
RUNTIME = os.path.join(HERE, "xla_cache")
PACK = os.path.join(HERE, "xla_cache_pack")
CHUNK = 90 * 1024 * 1024
CAP_MB = 500


def _pack_entries():
    """{entry name: [chunk paths in order]} from the tracked snapshot."""
    out = {}
    if not os.path.isdir(PACK):
        return out
    for f in sorted(os.listdir(PACK)):
        if ".part" not in f:
            continue
        name = f.rsplit(".part", 1)[0]
        out.setdefault(name, []).append(os.path.join(PACK, f))
    return out


def unpack() -> int:
    """Reassemble tracked entries missing from the runtime dir.

    Returns the number of entries restored.  Never overwrites a runtime
    entry (the runtime dir is the live truth between refreshes).
    """
    os.makedirs(RUNTIME, exist_ok=True)
    n = 0
    for name, chunks in _pack_entries().items():
        dst = os.path.join(RUNTIME, name)
        if os.path.exists(dst):
            continue
        tmp = dst + ".tmp"
        with open(tmp, "wb") as w:
            for c in chunks:
                with open(c, "rb") as r:
                    shutil.copyfileobj(r, w)
        os.replace(tmp, dst)
        n += 1
    return n


def pack() -> None:
    """Snapshot the runtime cache into the tracked pack dir.

    Splits entries into <= 90 MB chunks, deletes pack entries whose
    runtime twin is gone (stale), and enforces the 500 MB cap.
    """
    entries = sorted(os.listdir(RUNTIME)) if os.path.isdir(RUNTIME) else []
    entries = [e for e in entries if not e.endswith(".tmp")]
    total = sum(os.path.getsize(os.path.join(RUNTIME, e)) for e in entries)
    if total > CAP_MB * 1024 * 1024:
        raise SystemExit(
            f"runtime cache {total / 1e6:.0f} MB exceeds the {CAP_MB} MB "
            "policy cap — refresh cold first:\n"
            "  python benchmarks/cache_pack.py refresh && python bench.py"
        )
    os.makedirs(PACK, exist_ok=True)
    keep = set()
    for e in entries:
        src = os.path.join(RUNTIME, e)
        with open(src, "rb") as r:
            i = 0
            while True:
                buf = r.read(CHUNK)
                if not buf and i > 0:
                    break
                part = f"{e}.part{i:02d}"
                keep.add(part)
                path = os.path.join(PACK, part)
                # skip rewrite when unchanged (keeps git diffs minimal)
                if os.path.exists(path) and os.path.getsize(path) == len(buf):
                    with open(path, "rb") as old:
                        if old.read() == buf:
                            i += 1
                            if len(buf) < CHUNK:
                                break
                            continue
                with open(path, "wb") as w:
                    w.write(buf)
                i += 1
                if len(buf) < CHUNK:
                    break
    removed = 0
    for f in os.listdir(PACK):
        if f not in keep:
            os.remove(os.path.join(PACK, f))
            removed += 1
    print(f"packed {len(entries)} entries ({total / 1e6:.0f} MB), "
          f"pruned {removed} stale chunks")


def refresh() -> None:
    """Move the runtime cache aside so the next bench run starts cold."""
    if os.path.isdir(RUNTIME):
        bak = RUNTIME + ".stale"
        shutil.rmtree(bak, ignore_errors=True)
        os.replace(RUNTIME, bak)
        print(f"moved {RUNTIME} -> {bak}; next bench run is cold")
    os.makedirs(RUNTIME, exist_ok=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "unpack"
    if cmd == "unpack":
        print(f"restored {unpack()} entries")
    elif cmd == "pack":
        pack()
    elif cmd == "refresh":
        refresh()
    else:
        raise SystemExit(f"unknown command {cmd!r} (unpack|pack|refresh)")
