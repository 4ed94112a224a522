"""Install a protolite-backed stand-in for pyspark's generated
``StateMessage_pb2`` module, unblocking ``transformWithStateInPandas``
in environments without the ``google.protobuf`` runtime.

pyspark ships the GENERATED module (with the full serialized
FileDescriptorProto embedded) but the generated code imports the
protobuf runtime at module import. The state clients import it lazily
(``import pyspark.sql.streaming.proto.StateMessage_pb2 as ...`` inside
methods), so pre-registering a compatible module in ``sys.modules``
under the exact name is sufficient — in the DRIVER and in every Python
WORKER. Worker coverage: call :func:`install` at import time of the
module defining your StatefulProcessor (unpickling the processor
imports that module) AND inside ``init`` (belt and braces for
by-value-pickled processors).

The descriptor blob is extracted from the generated file via
``ast.literal_eval`` (never importing it), so the message/field/enum
definitions are pyspark's own — this shim adds only the runtime.
"""

from __future__ import annotations

import ast
import sys

MODULE_NAME = "pyspark.sql.streaming.proto.StateMessage_pb2"


def _descriptor_blob() -> bytes:
    # Read the generated module's SOURCE without executing it (it would
    # import the absent runtime), via the import machinery so it works
    # both from a filesystem install and from Spark workers' pyspark.zip
    # (zipimport). The proto package __init__ is license-header-only,
    # so resolving the spec is side-effect free.
    import importlib
    import importlib.machinery

    # PathFinder over the parent package's __path__, NOT
    # importlib.util.find_spec: the latter consults sys.modules first
    # and raises once install() has registered the (spec-less)
    # synthesized module under this name.
    parent = importlib.import_module(MODULE_NAME.rsplit(".", 1)[0])
    spec = importlib.machinery.PathFinder.find_spec(
        MODULE_NAME.rsplit(".", 1)[1], parent.__path__
    )
    if spec is None or spec.loader is None:
        raise RuntimeError(f"cannot locate {MODULE_NAME}")
    source = spec.loader.get_source(spec.name)
    tree = ast.parse(source)
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and getattr(node.func, "attr", "") == "AddSerializedFile"
        ):
            return ast.literal_eval(node.args[0])
    raise RuntimeError(
        f"no AddSerializedFile blob found in {MODULE_NAME}; pyspark's "
        "generated module layout changed — update state_proto_shim"
    )


def install(force: bool = False) -> None:
    """Idempotently register the protolite-backed module. A real
    ``google.protobuf`` runtime, if present, wins: the generated module
    imports fine then and this shim does nothing."""
    if not force:
        if MODULE_NAME in sys.modules:
            return
        try:
            # Probe a concrete runtime module, NOT the bare package: a
            # stray `google` NAMESPACE package (pyspark environments
            # commonly have one) makes `import google.protobuf` succeed
            # with no content, which round 4 measured as exactly the
            # failure mode ("cannot import name 'descriptor' ...
            # (unknown location)").
            from google.protobuf import descriptor  # noqa: F401

            return  # real runtime available; let the generated module load
        except ImportError:
            pass
    from etl_property_rumah123_spark.streaming import protolite

    mod = protolite.build_module(_descriptor_blob(), MODULE_NAME)
    sys.modules[MODULE_NAME] = mod
