"""Name-based UUID (version 5, SHA-1) as a pure JVM-side column expression.

The reference uses deterministic SHA-1-namespace GUIDs for idempotent
metadata messages (Infrastructure/DeterministicGuidGenerator.cs:39-75)
and the fixture log derives `message_id = uuid5(NAMESPACE, str(event_id))`
(FIXTURES.md §A.2). We build it from `sha1` + hex surgery so it runs
inside whole-stage codegen — no Python UDF in the scan path.

RFC 4122 v5: digest = SHA1(namespace_bytes || name_bytes); take the first
16 bytes; force byte6's high nibble to 0x5 (version) and byte8's top two
bits to 10 (variant). On the 40-char hex digest that is: hex[12] := '5',
hex[16] := hex((nibble & 0x3) | 0x8).
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F

#: RFC 4122 DNS namespace, used by the fixture derivation (FIXTURES.md §A.2).
NAMESPACE_DNS = uuid.UUID("6ba7b810-9dad-11d1-80b4-00c04fd430c8")


def uuid5_py(name: str, namespace: uuid.UUID = NAMESPACE_DNS) -> str:
    """Driver-side twin of :func:`uuid5_col` (stdlib uuid5)."""
    return str(uuid.uuid5(namespace, name))


def uuid5_col(name: Column, namespace: uuid.UUID = NAMESPACE_DNS) -> Column:
    """UUIDv5 of a string column, computed entirely JVM-side.

    The variant nibble map ``(n & 0x3) | 0x8`` over a single hex digit is
    expressed as a character ``translate`` — branch-free, and it keeps the
    expression tree shallow (a ``conv``/``pmod`` formulation made janino's
    whole-stage-codegen compile pathologically slow).
    """
    ns_hex = namespace.hex
    digest = F.sha1(F.concat(F.unhex(F.lit(ns_hex)), F.encode(name, "utf-8")))
    variant_nibble = F.translate(
        F.substring(digest, 17, 1), "0123456789abcdef", "89ab89ab89ab89ab"
    )
    return F.concat_ws(
        "-",
        F.substring(digest, 1, 8),
        F.substring(digest, 9, 4),
        F.concat(F.lit("5"), F.substring(digest, 14, 3)),
        F.concat(variant_nibble, F.substring(digest, 18, 3)),
        F.substring(digest, 21, 12),
    )
