"""Protobuf runtime shim for the transformWithStateInPandas e2e path.

pyspark 4's Spark-4 arbitrary-state API (StatefulProcessor /
transformWithStateInPandas) speaks a protobuf wire protocol between the
Python worker and the JVM state server; its generated code
(pyspark/sql/streaming/proto/StateMessage_pb2.py) demands the
`google.protobuf` runtime at gencode version 6.33. This container has
no protobuf distribution installed (and installing one is out of
scope), but the Google Cloud SDK on the box bundles a complete
pure-Python protobuf runtime at 6.33.0-dev under the appengine
platform directory. This module — imported automatically at interpreter
startup when `tools/pbshim` is on PYTHONPATH (the standard
`sitecustomize` hook, so it runs in BOTH the driver and every PySpark
worker daemon) — makes that runtime importable and relaxes the strict
gencode/runtime validator across the one-dev-suffix gap. It is a
strict no-op when a real `google.protobuf` is installed or the SDK
bundle is absent.

Subtlety: Spark's driver-side state-schema worker puts spark-core's
JAR on sys.path, and that jar carries `google/protobuf/*.proto`
resource files — enough for `import google.protobuf` to "succeed" as
an EMPTY namespace package. The presence probe therefore requires a
real package (module __file__ set), and the retried import purges the
cached namespace portions first.

Test-environment plumbing only: nothing in the engine imports this;
tests/conftest.py adds it to PYTHONPATH before the SparkSession (and
its JVM, whose captured environment the local-mode worker daemons
inherit) starts.
"""

import os
import sys

_APPENGINE = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _real_protobuf_present() -> bool:
    try:
        import google.protobuf as _gp
    except ImportError:
        return False
    # a bare namespace package (e.g. jar resource dirs) has no __file__
    return getattr(_gp, "__file__", None) is not None


def _enable() -> None:
    if _real_protobuf_present():
        return
    if not os.path.isfile(
        os.path.join(_APPENGINE, "google", "protobuf", "__init__.py")
    ):
        return
    # drop any cached namespace-package portions so the retried import
    # re-resolves against the extended path
    for mod in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
        del sys.modules[mod]
    # APPEND so any genuinely installed distribution always wins
    if _APPENGINE not in sys.path:
        sys.path.append(_APPENGINE)
    try:
        from google.protobuf import runtime_version as _rv

        # The bundle self-reports 6.32/-dev internally while shipping
        # the 6.33 feature surface; pyspark's gencode validator rejects
        # both the minor gap and the suffix mismatch. Relax the
        # validator ONLY for pyspark's generated modules and ONLY
        # across the known one-minor/dev-suffix gap — every other
        # gencode keeps the full compatibility check, so a runtime
        # genuinely missing a feature still fails with the clear
        # validator error instead of an obscure downstream one.
        _orig_validate = _rv.ValidateProtobufRuntimeVersion

        def _validate(gen_domain, gen_major, gen_minor, gen_patch,
                      gen_suffix, location):
            try:
                _orig_validate(gen_domain, gen_major, gen_minor,
                               gen_patch, gen_suffix, location)
            except _rv.VersionError:
                known_gap = (
                    (gen_major, gen_minor) == (6, 33)
                    and (_rv.MAJOR, _rv.MINOR) == (6, 32)
                )
                # pyspark's generated modules pass their .proto path as
                # location: org/apache/spark/... for the streaming state
                # protos, spark/connect/... for the spark-connect ones
                # (pyspark/sql/connect/proto/*_pb2.py).
                _pyspark_gen = location.startswith(
                    ("org/apache/spark/", "spark/connect/")
                )
                if not (_pyspark_gen and known_gap):
                    raise

        _rv.ValidateProtobufRuntimeVersion = _validate
    except Exception:  # pragma: no cover - bundle unusable: stay absent
        sys.path.remove(_APPENGINE)
        for mod in [
            m for m in sys.modules if m == "google" or m.startswith("google.")
        ]:
            del sys.modules[mod]


_enable()
