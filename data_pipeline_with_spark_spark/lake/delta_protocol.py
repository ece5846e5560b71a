"""Reader/replayer for the REAL Delta Lake transaction-log format, built
from the PUBLIC protocol specification (delta-io PROTOCOL.md) — no
delta-spark dependency.

Purpose (r12 verdict task 2): the lakehouse layer emulates Delta with
``VersionedTable``'s own JSON commit log, and delta-spark is not
installable in this container, so the emulation had never been diffed
against the real engine. This module closes the reachable half of that
gap: it replays hand-written ``_delta_log`` commit sequences written to
the letter of the public protocol (append, schema evolution, remove,
deletion-vector delete, RESTORE) into snapshots, and
``tests/test_delta_protocol_replay.py`` asserts — un-gated, in this
container — that ``VersionedTable`` driven through the equivalent
operations reaches the SAME user-visible state (row multisets, schema,
time-travel reads) at every step. The live-engine differential
(``tests/test_delta_differential.py``) stays env-gated and self-activates
when delta-spark becomes installable.

Protocol surface implemented (all from the public spec):

* Commit files ``_delta_log/<version % 020d>.json`` — newline-delimited
  JSON actions; replay in version order.
* Action reconciliation keyed by **(path, dvUniqueId)** per the spec
  (r13 advice: path-only keying let an intra-commit
  ``add(path, dv)``-before-``remove(path, no-dv)`` ordering pop the
  live DV-bearing add): last ``metaData`` wins; an ``add`` replaces any
  earlier ``add`` for the same (path, dvId); a ``remove`` tombstones
  exactly its (path, dvId). ``protocol`` gates reader support;
  ``commitInfo`` / ``txn`` are informational.
* Column mapping: in ``'name'`` mode parquet columns and
  ``partitionValues`` keys resolve through each schema field's
  ``delta.columnMapping.physicalName`` metadata; in ``'id'`` mode data
  columns resolve by the parquet ``field_id`` each file carries
  (matched to ``delta.columnMapping.id``) while partition values stay
  physical-name-keyed, per the spec.
* Checkpoints: classic single-file ``<v%020d>.checkpoint.parquet``,
  multi-part classic ``<v>.checkpoint.<k%010d>.<n%010d>.parquet``
  (completeness-validated), and V2 UUID-named
  ``<v>.checkpoint.<uniqueStr>.parquet`` with ``checkpointMetadata``
  and ``sidecar`` actions resolving into ``_delta_log/_sidecars/``
  parquet files.
* ``metaData.schemaString`` is Spark's own ``StructType`` JSON — parsed
  with ``StructType.fromJson``; ``partitionColumns`` values come from
  ``add.partitionValues`` (stringly, cast per schema on read).
* Deletion vectors: ``add.deletionVector`` descriptors with
  ``storageType`` ``"i"`` (Z85-inline) or ``"p"``/``"u"`` (on-disk DV
  file: 1-byte format version, then per-DV ``[int32 BE size][data]
  [int32 BE CRC32(data)]``). The DV data blob is ``[int32 LE magic]
  [RoaringBitmapArray]``; the portable RoaringBitmapArray is
  ``[int64 LE n_bitmaps]`` followed by standard-portable 32-bit
  RoaringBitmaps — all three container kinds (array, bitmap, run)
  decode, and the fixture encoder can emit each. Binary constants
  follow the spec as published; the JSON/action layer — the part the
  state-machine differential exercises — is exact.

Reference parity: reference ``update_versioning.py:40-79`` (UPDATE /
time travel / RESTORE) and ``lakehouse_data_igestion.py:126-212``
(enforcement / mergeSchema) are the behaviors the fixtures encode.
"""

from __future__ import annotations

import json
import struct
import zlib
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Z85 (ZeroMQ base-85, the alphabet Delta uses for inline DVs and DV
# file-name UUIDs). Input length must be a multiple of 4; callers trim
# with the descriptor's sizeInBytes.
_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("Z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        (n,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_ALPHABET[n % 85])
            n //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("Z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i : i + 5]:
            n = n * 85 + _Z85_DECODE[c]
        out += struct.pack(">I", n)
    return bytes(out)


# --------------------------------------------------------------------------
# RoaringBitmapArray (Delta's 64-bit bitmap: int64 LE count, then one
# standard-portable 32-bit RoaringBitmap per 4-billion "key" stripe).
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_DV_MAGIC = 1681511377


_NO_OFFSET_THRESHOLD = 4  # run-cookie streams omit offsets below this


def _decode_portable_roaring32(buf: bytes, off: int) -> tuple[set[int], int]:
    """Decode one standard-portable 32-bit RoaringBitmap starting at
    ``off``; return (values, next_offset). All three container kinds —
    array, bitmap, and run (the RoaringFormatSpec run cookie with its
    runFlag bitset; real engines emit runs for dense DVs)."""
    (cookie32,) = struct.unpack_from("<I", buf, off)
    cookie = cookie32 & 0xFFFF
    if cookie == _SERIAL_COOKIE_RUN:
        n_containers = (cookie32 >> 16) + 1
        off += 4
        n_flag_bytes = (n_containers + 7) // 8
        run_flags = buf[off : off + n_flag_bytes]
        off += n_flag_bytes
        has_offsets = n_containers >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n_containers,) = struct.unpack_from("<I", buf, off + 4)
        off += 8
        run_flags = b""
        has_offsets = True  # always present for the no-run cookie
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys_cards = []
    for _ in range(n_containers):
        key, card_m1 = struct.unpack_from("<HH", buf, off)
        keys_cards.append((key, card_m1 + 1))
        off += 4
    if has_offsets:
        off += 4 * n_containers
    values: set[int] = set()
    for i, (key, card) in enumerate(keys_cards):
        base = key << 16
        is_run = bool(run_flags) and (run_flags[i // 8] >> (i % 8)) & 1
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, off)
            off += 2
            for _ in range(n_runs):
                start, len_m1 = struct.unpack_from("<HH", buf, off)
                off += 4
                values.update(base | v for v in range(start, start + len_m1 + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, off)
            values.update(base | v for v in vals)
            off += 2 * card
        else:
            words = struct.unpack_from("<1024Q", buf, off)
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.add(base | (wi * 64 + b.bit_length() - 1))
                    w ^= b
            off += 8192
    return values, off


def decode_roaring_bitmap_array(data: bytes) -> set[int]:
    """Decode Delta's RoaringBitmapArray portable format into the set of
    deleted row indexes."""
    (n_bitmaps,) = struct.unpack_from("<q", data, 0)
    off = 8
    out: set[int] = set()
    for stripe in range(n_bitmaps):
        vals, off = _decode_portable_roaring32(data, off)
        out.update((stripe << 32) | v for v in vals)
    return out


def _runs_of(vals: list[int]) -> list[tuple[int, int]]:
    """Sorted 16-bit values → [(start, length-1)] runs."""
    runs: list[tuple[int, int]] = []
    start = prev = vals[0]
    for v in vals[1:]:
        if v == prev + 1:
            prev = v
            continue
        runs.append((start, prev - start))
        start = prev = v
    runs.append((start, prev - start))
    return runs


def encode_roaring_bitmap_array(
    row_indexes: set[int], run_containers: bool = False
) -> bytes:
    """Inverse of :func:`decode_roaring_bitmap_array` for fixture
    authoring. Default emits the no-run cookie with array containers
    (≤4096 values) and bitmap containers (8 KiB bitset) above;
    ``run_containers=True`` emits the run cookie with every container
    run-length encoded — the shape real engines produce for dense DVs."""
    stripes: dict[int, dict[int, list[int]]] = {}
    for ri in sorted(row_indexes):
        stripe, low32 = ri >> 32, ri & 0xFFFFFFFF
        stripes.setdefault(stripe, {}).setdefault(low32 >> 16, []).append(
            low32 & 0xFFFF
        )
    n_stripes = (max(stripes) + 1) if stripes else 0
    out = bytearray(struct.pack("<q", n_stripes))
    for s in range(n_stripes):
        containers = sorted(stripes.get(s, {}).items())
        n = len(containers)
        if run_containers and n:
            out += struct.pack("<I", _SERIAL_COOKIE_RUN | ((n - 1) << 16))
            flags = bytearray((n + 7) // 8)
            for i in range(n):
                flags[i // 8] |= 1 << (i % 8)
            out += bytes(flags)
            has_offsets = n >= _NO_OFFSET_THRESHOLD
        else:
            out += struct.pack("<I", _SERIAL_COOKIE_NO_RUN)
            out += struct.pack("<I", n)
            has_offsets = True
        for key, vals in containers:
            out += struct.pack("<HH", key, len(vals) - 1)
        bodies = []
        for _, vals in containers:
            if run_containers:
                runs = _runs_of(vals)
                body = struct.pack("<H", len(runs))
                for start, len_m1 in runs:
                    body += struct.pack("<HH", start, len_m1)
            elif len(vals) > 4096:
                bits = bytearray(8192)
                for v in vals:
                    bits[v >> 3] |= 1 << (v & 7)
                body = bytes(bits)
            else:
                body = struct.pack(f"<{len(vals)}H", *vals)
            bodies.append(body)
        if has_offsets:
            pos = len(out) + 4 * n
            for body in bodies:
                out += struct.pack("<I", pos)
                pos += len(body)
        for body in bodies:
            out += body
    return bytes(out)


def dv_blob(row_indexes: set[int]) -> bytes:
    """The DV *data* blob: LE magic + RoaringBitmapArray (what an inline
    descriptor Z85-encodes, padded to a 4-byte multiple)."""
    return struct.pack("<i", _DV_MAGIC) + encode_roaring_bitmap_array(row_indexes)


def decode_dv_blob(data: bytes) -> set[int]:
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != _DV_MAGIC:
        raise ValueError(f"bad DV magic {magic}")
    return decode_roaring_bitmap_array(data[4:])


def write_dv_file(path: Path, blobs: list[bytes]) -> list[tuple[int, int]]:
    """Write an on-disk DV file (format version 1); return the
    (offset, sizeInBytes) of each blob for descriptor authoring."""
    out = bytearray(b"\x01")
    spans = []
    for blob in blobs:
        spans.append((len(out), len(blob)))
        out += struct.pack(">i", len(blob))
        out += blob
        out += struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF)
    path.write_bytes(bytes(out))
    return spans


def _dv_row_indexes(descriptor: dict, table_path: Path) -> set[int]:
    st = descriptor["storageType"]
    size = descriptor["sizeInBytes"]
    if st == "i":
        data = z85_decode(descriptor["pathOrInlineDv"])[:size]
        return decode_dv_blob(data)
    if st in ("p", "u"):
        if st == "p":
            f = Path(descriptor["pathOrInlineDv"])
        else:  # "u": <optional prefix><z85 uuid> -> deletion_vector_<uuid>.bin
            enc = descriptor["pathOrInlineDv"]
            prefix, uuid_part = enc[:-20], enc[-20:]
            raw = z85_decode(uuid_part)
            import uuid as _uuid

            u = _uuid.UUID(bytes=raw)
            f = table_path / prefix / f"deletion_vector_{u}.bin"
        data = f.read_bytes()
        off = descriptor["offset"]
        # skip the int32 BE size word at `offset` per the spec layout
        (sz,) = struct.unpack_from(">i", data, off)
        if sz != size:
            raise ValueError(f"DV size mismatch: file {sz} vs descriptor {size}")
        blob = data[off + 4 : off + 4 + size]
        if zlib.crc32(blob) & 0xFFFFFFFF != struct.unpack_from(
            ">I", data, off + 4 + size
        )[0]:
            raise ValueError("DV checksum mismatch")
        return decode_dv_blob(blob)
    raise NotImplementedError(f"DV storageType {st!r}")


# --------------------------------------------------------------------------
# Log replay


@dataclass
class AddFile:
    path: str
    partition_values: dict[str, str] = field(default_factory=dict)
    deletion_vector: dict | None = None


@dataclass
class DeltaSnapshot:
    version: int
    schema: T.StructType
    partition_columns: list[str]
    files: list[AddFile]
    configuration: dict[str, str] = field(default_factory=dict)

    @property
    def column_mapping_mode(self) -> str:
        return self.configuration.get("delta.columnMapping.mode", "none")


_SUPPORTED_READER_FEATURES = {
    "deletionVectors",
    "columnMapping",
    "timestampNtz",
    "v2Checkpoint",
}


def dv_unique_id(dv: dict | None) -> str | None:
    """The spec's DV unique id — ``storageType + pathOrInlineDv`` plus
    ``@offset`` when an offset is present; None for no DV. File actions
    are keyed by (path, dvUniqueId), NOT path alone."""
    if dv is None:
        return None
    uid = f"{dv['storageType']}{dv['pathOrInlineDv']}"
    if dv.get("offset") is not None:
        uid = f"{uid}@{dv['offset']}"
    return uid


def _check_protocol(p: dict) -> None:
    # `or []`: checkpoint parquet rows materialize absent list fields
    # as None rather than omitting the key
    feats = set(p.get("readerFeatures") or [])
    if not feats <= _SUPPORTED_READER_FEATURES:
        raise NotImplementedError(
            f"unsupported readerFeatures {feats - _SUPPORTED_READER_FEATURES}"
        )
    if (p.get("minReaderVersion") or 1) not in (1, 2, 3):
        raise NotImplementedError("unknown minReaderVersion")


def _apply_metadata(md: dict) -> tuple[T.StructType, list[str], dict[str, str]]:
    fmt = (md.get("format") or {}).get("provider", "parquet")
    if fmt != "parquet":
        raise NotImplementedError(f"format {fmt}")
    schema = T.StructType.fromJson(json.loads(md["schemaString"]))
    partition_columns = list(md.get("partitionColumns") or [])
    configuration = dict(md.get("configuration") or {})
    mode = configuration.get("delta.columnMapping.mode", "none")
    if mode not in ("none", "name", "id"):
        raise NotImplementedError(
            f"columnMapping mode {mode!r} (supported: 'none', 'name', 'id')"
        )
    return schema, partition_columns, configuration


def _checkpoint_part_files(log_dir: Path, cp_version: int) -> list[Path]:
    """Resolve the parquet file(s) of the checkpoint at ``cp_version``:
    classic single-file, multi-part classic (all parts validated
    present), or a V2 UUID-named file (any one instance is complete)."""
    prefix = f"{cp_version:020d}.checkpoint"
    single = log_dir / f"{prefix}.parquet"
    if single.is_file():
        return [single]
    candidates = sorted(log_dir.glob(f"{prefix}.*.parquet"))
    # multi-part classic: <prefix>.<part %010d>.<n_parts %010d>.parquet
    multi = [
        f
        for f in candidates
        if (segs := f.name[len(prefix) + 1 : -len(".parquet")].split("."))
        and len(segs) == 2
        and all(s.isdigit() for s in segs)
    ]
    if multi:
        n_parts = {int(f.name.split(".")[-2]) for f in multi}
        if len(n_parts) != 1:
            raise ValueError(f"inconsistent multi-part checkpoint counts {n_parts}")
        n = n_parts.pop()
        ks = sorted(int(f.name.split(".")[-3]) for f in multi)
        if ks != list(range(1, n + 1)):
            raise ValueError(
                f"incomplete multi-part checkpoint: have parts {ks} of {n}"
            )
        return multi
    # V2: <prefix>.<uniqueStr>.parquet — multiple writers may race; any
    # one file is a complete checkpoint, so take the first sorted.
    v2 = [
        f
        for f in candidates
        if "." not in f.name[len(prefix) + 1 : -len(".parquet")]
    ]
    if v2:
        return [v2[0]]
    raise FileNotFoundError(f"no checkpoint parquet for version {cp_version}")


def _read_checkpoint(
    log_dir: Path, cp_version: int
) -> tuple[
    T.StructType | None, list[str], dict[str, str], dict[tuple, AddFile]
]:
    """Seed replay state from a checkpoint — classic single-file,
    multi-part classic, or V2 (UUID-named file whose ``sidecar``
    actions point at ``_delta_log/_sidecars/*.parquet`` holding the
    file actions). One action per parquet row as nullable structs;
    remove tombstones exist only for VACUUM and are ignored for
    snapshot reconstruction."""
    import pyarrow.parquet as pq

    schema: T.StructType | None = None
    partition_columns: list[str] = []
    configuration: dict[str, str] = {}
    active: dict[tuple, AddFile] = {}

    def apply_row(row: dict, allow_sidecar: bool) -> None:
        nonlocal schema, partition_columns, configuration
        md = row.get("metaData")
        if md and md.get("schemaString"):
            schema, partition_columns, configuration = _apply_metadata(md)
        p = row.get("protocol")
        if p and (p.get("minReaderVersion") is not None or p.get("readerFeatures")):
            _check_protocol(p)
        cm = row.get("checkpointMetadata")
        if cm and cm.get("version") is not None:
            if int(cm["version"]) != cp_version:
                raise ValueError(
                    f"checkpointMetadata version {cm['version']} != "
                    f"file version {cp_version}"
                )
        sc = row.get("sidecar")
        if sc and sc.get("path"):
            if not allow_sidecar:
                raise ValueError("sidecar action inside a sidecar file")
            sidecar_file = log_dir / "_sidecars" / sc["path"]
            for srow in pq.read_table(str(sidecar_file)).to_pylist():
                apply_row(srow, allow_sidecar=False)
        a = row.get("add")
        if a and a.get("path"):
            dv = a.get("deletionVector") or None
            active[(a["path"], dv_unique_id(dv))] = AddFile(
                path=a["path"],
                partition_values=dict(a.get("partitionValues") or {}),
                deletion_vector=dv,
            )

    for part in _checkpoint_part_files(log_dir, cp_version):
        for row in pq.read_table(str(part)).to_pylist():
            apply_row(row, allow_sidecar=True)
    return schema, partition_columns, configuration, active


def replay_log(table_path: str | Path, version: int | None = None) -> DeltaSnapshot:
    """Replay ``<table>/_delta_log/*.json`` up to ``version`` (latest if
    None) per the public action-reconciliation rules. If the log has a
    ``_last_checkpoint``, replay seeds from the checkpoint parquet and
    applies only the JSON commits after it — the path a real aged table
    requires once log cleanup has removed pre-checkpoint JSON commits;
    time travel to a cleaned-up version raises."""
    table_path = Path(table_path)
    log_dir = table_path / "_delta_log"
    commits = sorted(
        (int(f.stem), f) for f in log_dir.glob("*.json") if f.stem.isdigit()
    )
    if not commits:
        raise FileNotFoundError(f"no commits under {log_dir}")

    schema: T.StructType | None = None
    partition_columns: list[str] = []
    configuration: dict[str, str] = {}
    # (path, dvUniqueId) -> AddFile; a remove tombstones exactly its
    # (path, dvUniqueId) — the spec's file-action identity (r13 advice:
    # path-only keying was order-sensitive within a DV-delete commit).
    active: dict[tuple, AddFile] = {}

    latest = commits[-1][0]
    if version is not None and version > latest:
        # Real Delta raises VersionNotFoundException; silently serving
        # the latest snapshot would read wrong data on a typo'd version.
        raise ValueError(
            f"version {version} is newer than the latest commit ({latest})"
        )

    cp_version: int | None = None
    lc = log_dir / "_last_checkpoint"
    if lc.is_file():
        cp_version = int(json.loads(lc.read_text())["version"])
    have = {v for v, _ in commits}
    if cp_version is not None and 0 not in have and version is not None and version < cp_version:
        raise ValueError(
            f"version {version} predates the checkpoint ({cp_version}) "
            "and its JSON commits were cleaned up"
        )
    if (
        cp_version is not None
        and (version is None or version >= cp_version)
        # a fully retained JSON log can always serve the request; only
        # seed from the checkpoint when cleanup removed early commits
        and 0 not in have
    ):
        schema, partition_columns, configuration, active = _read_checkpoint(
            log_dir, cp_version
        )
        commits = [(v, f) for v, f in commits if v > cp_version]
        expected = list(range(cp_version + 1, cp_version + 1 + len(commits)))
        base_version = cp_version
    else:
        expected = list(range(len(commits)))
        base_version = None
    if [v for v, _ in commits] != expected:
        raise ValueError("non-contiguous Delta log")
    if version is not None:
        if base_version is not None and version < base_version:
            raise ValueError(
                f"version {version} predates the checkpoint ({base_version}) "
                "and its JSON commits were cleaned up"
            )
        commits = [(v, f) for v, f in commits if v <= version]
        if base_version is None and not commits:
            raise ValueError(f"version {version} predates the log")
    for v, f in commits:
        for line in f.read_text().splitlines():
            if not line.strip():
                continue
            action = json.loads(line)
            if "metaData" in action:
                schema, partition_columns, configuration = _apply_metadata(
                    action["metaData"]
                )
            elif "protocol" in action:
                _check_protocol(action["protocol"])
            elif "add" in action:
                a = action["add"]
                dv = a.get("deletionVector")
                active[(a["path"], dv_unique_id(dv))] = AddFile(
                    path=a["path"],
                    partition_values=a.get("partitionValues") or {},
                    deletion_vector=dv,
                )
            elif "remove" in action:
                r = action["remove"]
                active.pop((r["path"], dv_unique_id(r.get("deletionVector"))), None)
            # commitInfo / txn / cdc: informational, ignored
    if schema is None:
        raise ValueError("log contains no metaData action")
    if commits:
        final_version = commits[-1][0]
    else:  # checkpoint-seeded with no later JSON commits in range
        final_version = version if version is not None else cp_version
    return DeltaSnapshot(
        version=final_version,
        schema=schema,
        partition_columns=partition_columns,
        files=sorted(
            active.values(),
            key=lambda a: (a.path, dv_unique_id(a.deletion_vector) or ""),
        ),
        configuration=configuration,
    )


def _parquet_field_ids(path: Path) -> dict[int, str]:
    """field_id → column name from one parquet file's schema (arrow
    surfaces the parquet field_id as ``PARQUET:field_id`` field
    metadata) — the resolution key for columnMapping mode 'id'."""
    import pyarrow.parquet as pq

    out: dict[int, str] = {}
    for f in pq.read_schema(str(path)):
        fid = (f.metadata or {}).get(b"PARQUET:field_id")
        if fid is not None:
            out[int(fid)] = f.name
    return out


def read_snapshot(
    spark: SparkSession, table_path: str | Path, version: int | None = None
) -> DataFrame:
    """Materialize a replayed snapshot as a DataFrame: per-file parquet
    reads aligned to the snapshot schema (schema evolution → missing
    columns null), partition values injected from the log, DV-deleted
    rows dropped via the parquet ``_metadata.row_index`` column.

    Fixture-scale reader (a handful of files); the production-scale
    equivalent in this repo is ``VersionedTable``, whose reads go
    through one multi-path ``spark.read.parquet`` — this function
    exists to express the PROTOCOL's semantics exactly for the
    differential tests."""
    table_path = Path(table_path)
    snap = replay_log(table_path, version)
    mode = snap.column_mapping_mode
    if mode != "none":
        # Nested fields carry their own columnMapping metadata in real
        # Delta tables; this reader only resolves the TOP level, so a
        # mapped nested column would misresolve (r14 advice: the same
        # silent-NULL failure mode the r13 fix closed for flat
        # schemas). Refuse honestly until nested resolution exists.
        nested = [
            f.name
            for f in snap.schema.fields
            if isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType))
        ]
        if nested:
            raise NotImplementedError(
                f"columnMapping mode {mode!r} with nested columns "
                f"{nested} — nested physicalName/id resolution is not "
                "implemented"
            )

    def physical_name(fld: T.StructField) -> str:
        # With column mapping on, partitionValues keys ALWAYS use the
        # physical name stored in the field metadata (both modes), and
        # in 'name' mode data columns resolve by it too; the reader
        # that resolved by logical name materialized NULLs (r13 advice).
        if mode == "none":
            return fld.name
        phys = (fld.metadata or {}).get("delta.columnMapping.physicalName")
        if not phys:
            raise ValueError(
                f"columnMapping mode {mode!r} but field {fld.name!r} has no "
                "delta.columnMapping.physicalName metadata"
            )
        return phys

    def mapping_id(fld: T.StructField) -> int:
        cid = (fld.metadata or {}).get("delta.columnMapping.id")
        if cid is None:
            raise ValueError(
                f"columnMapping mode 'id' but field {fld.name!r} has no "
                "delta.columnMapping.id metadata"
            )
        return int(cid)

    parts: list[DataFrame] = []
    for af in snap.files:
        df = spark.read.parquet(str(table_path / af.path))
        if mode == "id":
            # 'id' mode matches data columns by the parquet field_id
            # each file carries, not by name (T.81-style physical names
            # may differ file-to-file after renames).
            fid_to_col = _parquet_field_ids(table_path / af.path)
        dv_rows: set[int] | None = None
        if af.deletion_vector is not None:
            dv_rows = _dv_row_indexes(af.deletion_vector, table_path)
        if dv_rows:  # an empty DV deletes nothing (isin() needs ≥1 value)
            df = df.select("*", F.col("_metadata.row_index").alias("__ri"))
            df = df.where(~F.col("__ri").isin(*[int(r) for r in dv_rows])).drop(
                "__ri"
            )
        cols = []
        file_cols = set(df.columns)
        for fld in snap.schema.fields:
            phys = physical_name(fld)
            if mode == "id":
                data_col = fid_to_col.get(mapping_id(fld))
            else:
                data_col = phys
            if phys in af.partition_values:
                raw = af.partition_values[phys]
                cols.append(
                    (F.lit(None) if raw is None else F.lit(raw))
                    .cast(fld.dataType)
                    .alias(fld.name)
                )
            elif data_col is not None and data_col in file_cols:
                cols.append(F.col(data_col).cast(fld.dataType).alias(fld.name))
            else:
                cols.append(F.lit(None).cast(fld.dataType).alias(fld.name))
        parts.append(df.select(*cols))
    if not parts:
        return spark.createDataFrame([], snap.schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
