"""Delta-style table transaction log: build, replay, snapshot, prune.

The one mainstream 100 TB storage layer the sources family lacked
(VERDICT r12 #3): a lakehouse table is a directory of immutable data
files plus an append-only ``_delta_log`` of JSON commits; readers
never list data files — they REPLAY the log (add/remove actions, last
action per path wins), reconstruct the live snapshot, and use the
per-file min/max stats carried on each ``add`` to PRUNE files a
predicate can never match (the Delta Lake / Iceberg planning model,
from the published Delta protocol — built from first principles, no
delta libraries).

Byte layout is RIGID so the log size is closed-form computable in SQL
(the ``src_avro_roundtrip`` varint-ladder precedent, with DIGIT
lengths via ``length(CAST(x AS STRING))`` instead):

- commit file ``%020d.json``; one compact JSON action per line + \\n.
- commit 0: ``protocol`` line, ``metaData`` line (md5(source) as the
  32-hex table id), then one ``add`` per data chunk.
- commit 1 (only when the table has >= 2 chunks): a compaction —
  ``remove`` for chunks 0 and 1, one ``add`` for the compacted file
  with merged stats.  This exercises the full replay semantics:
  a path's liveness depends on log ORDER, not set membership.

Data files are notional (stats-only manifest: the log IS the format
under test); their declared size is the per-record sizing formula
``octet_length(text) + digits(doc_id) + 22`` summed over the chunk.

Reference scope: the reference engine (src/lib.rs:1-86) has no table
format surface; this is the LLM-pipeline storage extension mandated by
the build brief (sources family).
"""

from __future__ import annotations

import hashlib
import json

CHUNK = 8  # records per data chunk (>= 2 chunks at every testdata SF)
REC_OVERHEAD = 22  # notional per-record framing in the data-file sizing

PROTO_LINE = '{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}'
META_TMPL = (
    '{"metaData":{"id":"%s","format":"json","schemaString":'
    '"doc_id BIGINT, text STRING","partitionColumns":[],"source":"%s"}}'
)
ADD_TMPL = (
    '{"add":{"path":"%s","size":%d,"numRecords":%d,'
    '"minDocId":%d,"maxDocId":%d,"dataChange":true}}'
)
RM_TMPL = '{"remove":{"path":"%s","dataChange":false}}'

# closed-form line-length bases (placeholders empty / single-digit)
META_BASE = len(META_TMPL % ("", "")) + 32  # + len(source)
ADD_BASE = len(ADD_TMPL % ("", 0, 0, 0, 0)) - 4  # + pathlen + 4 digit-lens
RM_BASE = len(RM_TMPL % ("",))  # + pathlen


def chunk_path(source: str, k: int) -> str:
    return f"part-{source}-{k:05d}.json"


def compact_path(source: str) -> str:
    return f"compact-{source}-00000.json"


def rec_size(doc_id: int, text_bytes: int) -> int:
    return text_bytes + len(str(doc_id)) + REC_OVERHEAD


def build_log(source: str, records) -> dict[int, bytes]:
    """records: [(doc_id, text_utf8_len)] — MUST be doc_id-sorted.
    Returns {version: commit_bytes}."""
    chunks = [records[i:i + CHUNK] for i in range(0, len(records), CHUNK)]
    stats = [
        (
            chunk_path(source, k),
            sum(rec_size(d, nb) for d, nb in ch),
            len(ch),
            ch[0][0],
            ch[-1][0],
        )
        for k, ch in enumerate(chunks)
    ]
    table_id = hashlib.md5(source.encode()).hexdigest()
    v0 = [PROTO_LINE, META_TMPL % (table_id, source)]
    v0 += [ADD_TMPL % s for s in stats]
    log = {0: ("\n".join(v0) + "\n").encode()}
    if len(stats) >= 2:
        merged = (
            compact_path(source),
            stats[0][1] + stats[1][1],
            stats[0][2] + stats[1][2],
            min(stats[0][3], stats[1][3]),
            max(stats[0][4], stats[1][4]),
        )
        v1 = [RM_TMPL % (stats[0][0],), RM_TMPL % (stats[1][0],),
              ADD_TMPL % merged]
        log[1] = ("\n".join(v1) + "\n").encode()
    return log


def replay_log(log: dict[int, bytes]) -> dict:
    """Replay commits in version order with full framing validation;
    returns the snapshot + accounting.

    Validates: versions contiguous from 0; commit 0 opens with
    protocol then metaData; exactly one action per line, known type;
    adds never duplicate a live path; removes only reference live
    paths.  Liveness is replay-order state — the property a
    set-difference shortcut would get wrong."""
    versions = sorted(log)
    if versions != list(range(len(versions))):
        raise ValueError(f"non-contiguous log versions: {versions}")
    live: dict[str, dict] = {}
    n_removed = 0
    log_bytes = 0
    for v in versions:
        blob = log[v]
        log_bytes += len(blob)
        if not blob.endswith(b"\n"):
            raise ValueError(f"commit {v} missing trailing newline")
        lines = blob.decode().splitlines()
        for i, line in enumerate(lines):
            act = json.loads(line)
            if len(act) != 1:
                raise ValueError(f"commit {v} line {i}: multi-key action")
            (kind, body), = act.items()
            if v == 0 and i == 0:
                if kind != "protocol":
                    raise ValueError("commit 0 must open with protocol")
                continue
            if v == 0 and i == 1:
                if kind != "metaData":
                    raise ValueError("commit 0 line 1 must be metaData")
                continue
            if kind == "add":
                if body["path"] in live:
                    raise ValueError(f"duplicate add: {body['path']}")
                live[body["path"]] = body
            elif kind == "remove":
                if body["path"] not in live:
                    raise ValueError(f"remove of dead path: {body['path']}")
                del live[body["path"]]
                n_removed += 1
            elif kind in ("protocol", "metaData"):
                raise ValueError(f"{kind} outside commit-0 header")
            else:
                raise ValueError(f"unknown action {kind!r}")
    return {
        "n_commits": len(versions),
        "log_bytes": log_bytes,
        "live": live,
        "n_removed": n_removed,
    }


def time_travel_manifests(source: str, records) -> list[dict]:
    """Snapshot AS OF every version (time travel): replay the log
    prefix [0..v] for each v and emit the live-set accounting — the
    reader contract that lets a pipeline pin a training run to the
    exact file set it saw.  One row per (source, version)."""
    log = build_log(source, records)
    out = []
    for v in sorted(log):
        rep = replay_log({u: log[u] for u in sorted(log) if u <= v})
        live = rep["live"].values()
        out.append({
            "source": source,
            "version": v,
            "n_live_files": len(live),
            "n_removed_files": rep["n_removed"],
            "live_records": sum(a["numRecords"] for a in live),
            "live_bytes": sum(a["size"] for a in live),
            "log_bytes": rep["log_bytes"],
        })
    return out


def build_checkpoint(live: dict[str, dict]) -> bytes:
    """Canonical CHECKPOINT of a snapshot: one add action per live
    file, path-sorted, same rigid line layout as the log — the
    compacted state a reader loads instead of replaying every commit
    (Delta writes checkpoints as parquet; the canonical-JSON form
    keeps the byte accounting closed-form for the oracle)."""
    lines = [
        ADD_TMPL % (a["path"], a["size"], a["numRecords"],
                    a["minDocId"], a["maxDocId"])
        for _p, a in sorted(live.items())
    ]
    return ("\n".join(lines) + "\n").encode() if lines else b""


def read_checkpoint(blob: bytes) -> dict[str, dict]:
    """Parse a checkpoint back to the snapshot it froze, validating
    the one-add-per-line framing and path sort order."""
    live: dict[str, dict] = {}
    prev = None
    for i, line in enumerate(blob.decode().splitlines()):
        act = json.loads(line)
        if set(act) != {"add"}:
            raise ValueError(f"checkpoint line {i}: not an add action")
        body = act["add"]
        if prev is not None and body["path"] <= prev:
            raise ValueError(f"checkpoint line {i}: paths not sorted")
        if body["path"] in live:
            raise ValueError(f"checkpoint dup path: {body['path']}")
        prev = body["path"]
        live[body["path"]] = body
    return live


def checkpoint_manifest(source: str, records) -> dict:
    """build -> replay -> CHECKPOINT -> read back -> prove equal:
    the reader-equivalence contract a checkpoint exists for, proven
    in-row (full-replay live set vs checkpoint-loaded live set)."""
    log = build_log(source, records)
    rep = replay_log(log)
    ckpt = build_checkpoint(rep["live"])
    back = read_checkpoint(ckpt)
    match = int(back == rep["live"])
    live = list(rep["live"].values())
    return {
        "source": source,
        "n_live_files": len(live),
        "live_records": sum(a["numRecords"] for a in live),
        "live_bytes": sum(a["size"] for a in live),
        "ckpt_bytes": len(ckpt),
        "log_bytes": rep["log_bytes"],
        "ckpt_equals_replay": match,
    }


def vacuum_plans(source: str, records) -> list[dict]:
    """VACUUM / retention-sweep planner (r14 — VERDICT r13 #6, the
    missing maintenance op in the log lifecycle): for every retention
    horizon h (earliest retained snapshot version), a data file is
    vacuum-ELIGIBLE iff it was tombstoned by some remove action AND it
    is not referenced by (live in) ANY retained snapshot — the Delta
    VACUUM criterion, computed by genuinely replaying each retained
    log prefix (never a set-difference shortcut).  One row per
    (source, horizon 0..latest):

    - n_snapshots_retained, n_files_referenced / referenced_bytes
      (union of the retained snapshots' live sets),
    - n_tombstones (files ever removed), n_eligible / reclaimed_bytes
      (tombstoned AND unreferenced — the planner's delete list).

    At h=0 every snapshot is retained, so tombstoned files are still
    referenced by the pre-compaction snapshot and nothing reclaims;
    at h=1 only the compacted snapshot survives and the two merged
    chunks become reclaimable.  Conservation: referenced_bytes at the
    final horizon equals the live byte mass (compaction conserves
    bytes)."""
    log = build_log(source, records)
    versions = sorted(log)
    # every add ever written and every tombstone, from the log itself
    all_adds: dict[str, dict] = {}
    tombstones: set[str] = set()
    for v in versions:
        for line in log[v].decode().splitlines():
            act = json.loads(line)
            (kind, body), = act.items()
            if kind == "add":
                all_adds[body["path"]] = body
            elif kind == "remove":
                tombstones.add(body["path"])
    out = []
    for h in versions:
        retained = [v for v in versions if v >= h]
        referenced: dict[str, dict] = {}
        for v in retained:
            rep = replay_log({u: log[u] for u in versions if u <= v})
            referenced.update(rep["live"])
        eligible = sorted(tombstones - set(referenced))
        out.append({
            "source": source,
            "horizon": h,
            "n_snapshots_retained": len(retained),
            "n_files_referenced": len(referenced),
            "referenced_bytes": sum(a["size"]
                                    for a in referenced.values()),
            "n_tombstones": len(tombstones),
            "n_eligible": len(eligible),
            "reclaimed_bytes": sum(all_adds[p]["size"]
                                   for p in eligible),
        })
    return out


def snapshot_manifest(source: str, records) -> dict:
    """build -> replay -> snapshot stats + min/max predicate pruning
    for a ``doc_id >= (min+max) div 2`` scan (all doc_ids are
    nonnegative, so idiv semantics agree cross-engine)."""
    log = build_log(source, records)
    rep = replay_log(log)
    live = sorted(rep["live"].values(), key=lambda a: a["path"])
    mn = min(d for d, _ in records)
    mx = max(d for d, _ in records)
    thresh = (mn + mx) // 2
    pruned = [a for a in live if a["maxDocId"] < thresh]
    scanned = [a for a in live if a["maxDocId"] >= thresh]
    if sum(a["numRecords"] for a in live) != len(records):
        raise AssertionError("snapshot lost records")
    return {
        "source": source,
        "n_commits": rep["n_commits"],
        "log_bytes": rep["log_bytes"],
        "n_live_files": len(live),
        "n_removed_files": rep["n_removed"],
        "live_records": sum(a["numRecords"] for a in live),
        "live_bytes": sum(a["size"] for a in live),
        "n_pruned_files": len(pruned),
        "scanned_records": sum(a["numRecords"] for a in scanned),
    }
