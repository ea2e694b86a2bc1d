"""google.protobuf discovery for Spark 4's transformWithStateInPandas.

The transformWithStateInPandas wire protocol (driver worker <-> JVM state
server) needs ``google.protobuf`` in the PYTHON environment. Cluster images
ship it via pip; this sandbox has no pip and no site-packages protobuf — but
a complete modern runtime (6.x) exists on disk inside the google-cloud-sdk
bundle. ``ensure_protobuf()`` makes it importable without installing
anything:

- builds a shim directory containing ONLY a ``google/protobuf`` symlink to
  the discovered runtime (never the whole SDK tree — its other top-level
  modules must not leak into ``sys.path``);
- prepends it to ``sys.path`` AND ``$PYTHONPATH`` so Python workers forked
  by the JVM inherit it (call before the SparkSession starts —
  ``session.get_spark`` does);
- sets ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK=true``, protobuf's own
  escape hatch, because pyspark 4.1.2's generated ``StateMessage_pb2`` is
  protobuf-5.x gencode while the discovered runtime is 6.x. The message
  schema involved is pyspark's own tiny state protocol, exercised
  end-to-end by the tws parity tests, so the blanket version gate is safely
  out of scope here. On an image with a pip-installed protobuf all of this
  is a no-op.
"""

from __future__ import annotations

import os
import sys

# Known on-disk protobuf runtimes, preferred order (each is the package dir
# itself, i.e. .../google/protobuf).
_CANDIDATES = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf",
    "/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk/google/protobuf",
]

# per-uid dir: a shared fixed /tmp name would let another local user
# pre-own the path and re-point the symlink under us (PYTHONPATH injection)
_SHIM_DIR = os.path.join(
    os.environ.get("TMPDIR", "/tmp"), f"core_spark_pbshim_{os.getuid()}"
)


def _import_ok() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _dir_trusted(path: str) -> bool:
    """True iff *path* is a real directory we own that nobody else can
    write. The per-uid name under /tmp is predictable, so another local
    user could pre-create it (makedirs exist_ok=True would accept that
    silently) and re-point the protobuf symlink at attacker code that
    every forked Spark worker imports. Ownership + no group/other write
    bits closes that: an attacker-owned or world-writable dir is refused."""
    try:
        st = os.lstat(path)
    except OSError:
        return False
    import stat as _stat

    return (
        _stat.S_ISDIR(st.st_mode)
        and st.st_uid == os.getuid()
        and not (st.st_mode & 0o022)
    )


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable (see module docstring).

    Returns True when the import works (natively or via the shim). Safe to
    call repeatedly; mutates ``sys.path`` / ``os.environ`` only when a shim
    is actually needed AND available.
    """
    if _import_ok():
        return True
    src = next((c for c in _CANDIDATES if os.path.isdir(c)), None)
    if src is None:
        return False
    link = os.path.join(_SHIM_DIR, "google", "protobuf")
    try:
        # Create each level explicitly with mode=0o700 (makedirs applies
        # mode to the LEAF only; under a permissive umask the intermediate
        # _SHIM_DIR would come out group/other-writable and fail its own
        # trust check). exist_ok dirs are then re-checked by _dir_trusted
        # so a pre-planted dir (predictable name) can't smuggle a hostile
        # shim; a dir WE own that merely has loose bits (e.g. created by an
        # older build under umask 002) is healed with chmod, while a
        # foreign-owned dir is refused outright.
        for d in (_SHIM_DIR, os.path.dirname(link)):
            os.makedirs(d, mode=0o700, exist_ok=True)
            if not _dir_trusted(d):
                st = os.lstat(d)
                if not (os.path.isdir(d) and not os.path.islink(d)
                        and st.st_uid == os.getuid()):
                    return False
                os.chmod(d, 0o700)
                if not _dir_trusted(d):
                    return False
        # a dir that was ever loose may carry planted entries chmod can't
        # undo (google/__init__.py would execute from sys.path); allow only
        # the exact tree this module builds, refuse anything else
        if set(os.listdir(_SHIM_DIR)) - {"google"}:
            return False
        gdir = os.path.dirname(link)
        # concurrent first-time callers stage as protobuf.<pid>.tmp (see
        # below) — those are ours and transient, everything else is refused
        extras = {
            e for e in os.listdir(gdir)
            if e != "protobuf"
            and not (e.startswith("protobuf.") and e.endswith(".tmp"))
        }
        if extras:
            return False
        if not os.path.islink(link) or os.readlink(link) != src:
            # pid-unique staging name: concurrent first-time callers (e.g.
            # a 4-job bench fleet starting together) must not race on one
            # shared .tmp; os.replace onto the final name is atomic
            tmp = f"{link}.{os.getpid()}.tmp"
            if os.path.islink(tmp) or os.path.exists(tmp):
                os.unlink(tmp)
            os.symlink(src, tmp)
            os.replace(tmp, link)
    except OSError:
        # a concurrent winner may have installed the link; fall through to
        # the import check rather than failing outright
        if not (os.path.islink(link) and os.path.isdir(link)):
            return False
    if _SHIM_DIR not in sys.path:
        sys.path.insert(0, _SHIM_DIR)
    pp = os.environ.get("PYTHONPATH", "")
    if _SHIM_DIR not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _SHIM_DIR + (os.pathsep + pp if pp else "")
        )
    # protobuf's own opt-out for the 5.x-gencode / 6.x-runtime pairing
    os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
    return _import_ok()
