"""Test-environment shim: make `google.protobuf` importable from the
pure-Python runtime that ships inside this container's google-cloud-sdk
(platform/google_appengine), for processes (Spark Python workers) whose
PYTHONPATH includes this directory.

The container has no pip-installed protobuf, but pyspark's
transformWithStateInPandas state protocol needs one; the bundled
6.32 runtime is wire-compatible with pyspark's 6.33-gencode
StateMessage proto, so the gencode>=runtime version gate is relaxed
(only when this shim is active — production deployments install a real
protobuf and never load this file).

Two traps this handles:
- a merely-importable `google.protobuf` is NOT enough: Spark workers
  carry spark-core's jar on sys.path, whose internal google/ directory
  forms an EMPTY namespace package that satisfies `import
  google.protobuf` and then fails on every real symbol — so the probe
  imports `descriptor`, the module the state protocol actually needs;
- when the probe fails, the half-built namespace modules must be purged
  from sys.modules before the real path is added, and the path is
  PREPENDED so the regular package (with __init__) wins the namespace
  scan over the jar's empty portion.

No-op when a real protobuf is importable or the SDK copy is absent.
"""

import os
import sys

_GAE = "/usr/lib/google-cloud-sdk/platform/google_appengine"

try:
    from google.protobuf import descriptor  # noqa: F401 - real install
except Exception:
    if os.path.isdir(os.path.join(_GAE, "google", "protobuf")):
        for _m in [m for m in sys.modules
                   if m == "google" or m.startswith("google.")]:
            del sys.modules[_m]
        sys.path.insert(0, _GAE)
        try:
            from google.protobuf import runtime_version

            runtime_version.ValidateProtobufRuntimeVersion = (
                lambda *a, **k: None)
        except Exception:
            pass
