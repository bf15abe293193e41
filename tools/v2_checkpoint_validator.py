#!/usr/bin/env python
"""Independent structural validator for delta_lite-WRITTEN checkpoints
(round 10, verdict ask #2).

The write side of the checkpoint path previously earned trust only via
round-trips through the engine's own reader — self-referential. This
tool validates a table's newest checkpoint against the PUBLIC Delta
protocol rules (delta.io PROTOCOL.md: checkpoint naming, v2 manifest /
sidecar layout, action uniqueness, `_last_checkpoint` contents, and
state equivalence with JSON-log replay) using ONLY pyarrow + json — it
never imports lcr_etl_upgrade_spark, mirroring the
tools/codec_differential.py standard (independent implementation, no
shared code with the thing under test).

Checks:
  C1  `_last_checkpoint` parses; its version names an existing
      checkpoint file; no multi-part `parts` field for these layouts;
      `size` equals the total action count across manifest + sidecars.
  C2  file naming: classic `{v:020d}.checkpoint.parquet` or v2
      `{v:020d}.checkpoint.{uuid}.parquet` (RFC-4122 uuid).
  C3  layout legality: the v2 layout appears only when the protocol
      lists the `v2Checkpoint` reader feature AND
      delta.checkpointPolicy != classic; conversely a feature-listed
      policy=v2 table must have gotten the v2 layout.
  C4  v2 manifest: exactly ONE checkpointMetadata action carrying
      version == v; NO add/remove actions inline (this writer's
      contract: file actions live in sidecars); every sidecar action
      names an existing `_sidecars/` parquet whose on-disk size equals
      sizeInBytes.
  C5  exactly one protocol action and one metaData action across the
      checkpoint.
  C6  state equivalence vs an INDEPENDENT replay of the JSON commits
      0..v (this file's own ~40-line replay of the protocol's
      file-action reconciliation — latest add per path wins; a remove
      retires a path only when its deletionVector uniqueId matches the
      tracked one): active file set, per-file partitionValues,
      deletionVector descriptors, optional add fields (stats, tags,
      rowTracking's baseRowId/defaultRowCommitVersion), latest
      metaData, latest protocol, latest txn per appId, latest
      domainMetadata per domain. Requires the pre-checkpoint JSON
      commits to still exist (run before cleanup_log).

Usage:
    python tools/v2_checkpoint_validator.py TABLE_PATH [TABLE_PATH ...]

Prints one JSON line per table; exit 1 on any violation.
"""

from __future__ import annotations

import json
import os
import re
import sys
import urllib.parse

import pyarrow.parquet as pq

_CLASSIC_RE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")
_V2_RE = re.compile(
    r"^(\d{20})\.checkpoint\.([0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-"
    r"[0-9a-f]{4}-[0-9a-f]{12})\.parquet$"
)
_ACTION_KEYS = (
    "add", "remove", "metaData", "protocol", "txn", "domainMetadata",
    "checkpointMetadata", "sidecar",
)


def _strip_nulls(x):
    """from_json-written parquet structs surface absent fields as
    explicit nulls; protocol semantics treat null as absent."""
    if isinstance(x, dict):
        return {k: _strip_nulls(v) for k, v in x.items() if v is not None}
    if isinstance(x, list):
        return [_strip_nulls(v) for v in x]
    return x


def _typed(value, typ):
    """pyarrow's to_pylist renders parquet MAP columns as [(k, v), ...]
    pair lists; convert to dicts schema-aware (recursing structs/lists)
    so comparisons against JSON-parsed actions are type-faithful."""
    import pyarrow as pa

    if value is None:
        return None
    if pa.types.is_map(typ):
        return {k: _typed(v, typ.item_type) for k, v in value}
    if pa.types.is_struct(typ):
        return {
            f.name: _typed(value.get(f.name), f.type) for f in typ
        }
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        return [_typed(v, typ.value_type) for v in value]
    return value


def _parquet_actions(path: str) -> list[dict]:
    out = []
    table = pq.read_table(path)
    types = {f.name: f.type for f in table.schema}
    for raw in table.to_pylist():
        row = {k: _typed(v, types[k]) for k, v in raw.items()}
        present = [k for k in _ACTION_KEYS if row.get(k) is not None]
        for k in present:
            out.append({k: _strip_nulls(row[k])})
        unknown = [
            k for k, v in row.items()
            if k not in _ACTION_KEYS and v is not None
        ]
        if unknown:
            out.append({"__unknown__": unknown})
    return out


def _dv_uid(dv: dict | None) -> str | None:
    if not dv:
        return None
    return (
        f"{dv.get('storageType')}:{dv.get('pathOrInlineDv')}"
        f"@{dv.get('offset') or 0}"
    )


def _replay_json(log_dir: str, upto: int) -> dict:
    """Independent restatement of the protocol's log replay over JSON
    commits 0..upto (inclusive)."""
    state = {
        "files": {}, "metaData": None, "protocol": None,
        "txns": {}, "domains": {},
    }
    for v in range(upto + 1):
        p = os.path.join(log_dir, f"{v:020d}.json")
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"commit {v} missing: the validator replays the JSON log "
                "for ground truth — run it BEFORE cleanup_log"
            )
        with open(p) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action:
                    a = action["add"]
                    rel = urllib.parse.unquote(a["path"])
                    state["files"][rel] = a
                elif "remove" in action:
                    r = action["remove"]
                    rel = urllib.parse.unquote(r["path"])
                    tracked = state["files"].get(rel)
                    if tracked is not None and _dv_uid(
                        r.get("deletionVector")
                    ) == _dv_uid(tracked.get("deletionVector")):
                        del state["files"][rel]
                elif "metaData" in action:
                    state["metaData"] = action["metaData"]
                elif "protocol" in action:
                    state["protocol"] = action["protocol"]
                elif "txn" in action:
                    t = action["txn"]
                    if t.get("appId") is not None:
                        state["txns"][t["appId"]] = t
                elif "domainMetadata" in action:
                    d = action["domainMetadata"]
                    if d.get("domain") is not None:
                        state["domains"][d["domain"]] = d
    return state


# add fields that are semantic state a checkpoint must carry; the rest
# (size is recomputed from disk, modificationTime/dataChange are
# non-semantic per the protocol's checkpoint rules) are layout-local
_ADD_SEMANTIC = (
    "partitionValues", "deletionVector", "stats", "tags",
    "baseRowId", "defaultRowCommitVersion",
)


def _semantic_add(a: dict) -> dict:
    a = _strip_nulls(a)
    out = {k: a[k] for k in _ADD_SEMANTIC if k in a and a[k] is not None}
    # {} partitionValues == absent for comparison purposes
    if out.get("partitionValues") == {}:
        out.pop("partitionValues", None)
    return out


def validate_table(path: str) -> dict:
    log_dir = os.path.join(path, "_delta_log")
    violations: list[str] = []

    # ---- C1: _last_checkpoint --------------------------------------
    lc_path = os.path.join(log_dir, "_last_checkpoint")
    if not os.path.exists(lc_path):
        return {"path": path, "ok": False,
                "violations": ["no _last_checkpoint"]}
    try:
        with open(lc_path) as fh:
            lc = json.load(fh)
        v = int(lc["version"])
    except (ValueError, KeyError, TypeError, OSError) as exc:
        # a malformed pointer is a C1 violation, not a validator crash
        return {"path": path, "ok": False, "violations": [
            f"C1: _last_checkpoint unparseable: {exc!r}"]}
    if "parts" in lc:
        violations.append("C1: unexpected multi-part `parts` field")

    names = os.listdir(log_dir)
    classic = [n for n in names
               if (m := _CLASSIC_RE.match(n)) and int(m.group(1)) == v]
    v2 = [n for n in names
          if (m := _V2_RE.match(n)) and int(m.group(1)) == v]
    stray = [
        n for n in names
        if ".checkpoint." in n and n not in classic and n not in v2
        and not _CLASSIC_RE.match(n) and not _V2_RE.match(n)
    ]
    if stray:
        violations.append(f"C2: unrecognized checkpoint names {stray}")
    if not classic and not v2:
        violations.append(
            f"C1: _last_checkpoint points at version {v} but no "
            "checkpoint file exists for it"
        )
        return {"path": path, "ok": False, "violations": violations}
    if classic and v2:
        violations.append("C2: BOTH classic and v2 layouts at one version")
    use_v2 = bool(v2)

    # ---- ground truth: independent JSON replay ----------------------
    truth = _replay_json(log_dir, v)
    proto = truth["protocol"] or {}
    feats = set(proto.get("readerFeatures") or ())
    policy = ((truth["metaData"] or {}).get("configuration") or {}).get(
        "delta.checkpointPolicy", ""
    )

    # ---- C3: layout legality ----------------------------------------
    if use_v2 and "v2Checkpoint" not in feats:
        violations.append(
            "C3: v2 layout written without the v2Checkpoint reader feature"
        )
    if use_v2 and policy == "classic":
        violations.append("C3: v2 layout despite checkpointPolicy=classic")
    if not use_v2 and "v2Checkpoint" in feats and policy != "classic":
        # the writer contract under validation: a feature-listed table
        # gets the v2 layout unless policy says classic EXPLICITLY — an
        # unset policy defaults to v2 (write_checkpoint's use_v2 rule),
        # so a classic layout there is the layout-switch bug class
        violations.append(
            "C3: classic layout on a feature-listed table whose policy "
            "does not say classic"
        )

    # ---- load checkpoint actions ------------------------------------
    total_actions = 0
    actions: list[dict] = []
    if use_v2:
        manifest = os.path.join(log_dir, sorted(v2)[-1])
        man_actions = _parquet_actions(manifest)
        total_actions += len(man_actions)
        cms = [a["checkpointMetadata"] for a in man_actions
               if "checkpointMetadata" in a]
        if len(cms) != 1:
            violations.append(
                f"C4: expected exactly 1 checkpointMetadata, got {len(cms)}"
            )
        elif int(cms[0].get("version", -1)) != v:
            violations.append(
                f"C4: checkpointMetadata.version {cms[0].get('version')} "
                f"!= {v}"
            )
        if any("add" in a or "remove" in a for a in man_actions):
            violations.append("C4: file actions inline in the v2 manifest")
        for a in man_actions:
            sc = a.get("sidecar")
            if sc is None:
                continue
            sc_path = os.path.join(log_dir, "_sidecars", sc["path"])
            if not os.path.exists(sc_path):
                violations.append(f"C4: dangling sidecar {sc['path']}")
                continue
            if os.path.getsize(sc_path) != sc.get("sizeInBytes"):
                violations.append(
                    f"C4: sidecar {sc['path']} sizeInBytes "
                    f"{sc.get('sizeInBytes')} != disk "
                    f"{os.path.getsize(sc_path)}"
                )
            sc_actions = _parquet_actions(sc_path)
            total_actions += len(sc_actions)
            bad = [a for a in sc_actions
                   if not ("add" in a or "remove" in a)]
            if bad:
                violations.append(
                    "C4: non-file actions in a sidecar: "
                    f"{sorted({next(iter(a)) for a in bad})}"
                )
            actions.extend(sc_actions)
        actions.extend(
            a for a in man_actions if "sidecar" not in a
            and "checkpointMetadata" not in a
        )
    else:
        cp = os.path.join(log_dir, sorted(classic)[-1])
        actions = _parquet_actions(cp)
        total_actions = len(actions)
        if any("checkpointMetadata" in a or "sidecar" in a
               for a in actions):
            violations.append(
                "C2: v2-only actions inside a classic-named checkpoint"
            )

    unknown = [a["__unknown__"] for a in actions if "__unknown__" in a]
    if unknown:
        violations.append(f"C5: unknown action columns {unknown[:3]}")

    if int(lc.get("size", -1)) != total_actions:
        violations.append(
            f"C1: _last_checkpoint.size {lc.get('size')} != actual "
            f"action count {total_actions}"
        )

    # ---- C5: action uniqueness --------------------------------------
    protos = [a["protocol"] for a in actions if "protocol" in a]
    metas = [a["metaData"] for a in actions if "metaData" in a]
    if len(protos) != 1:
        violations.append(f"C5: {len(protos)} protocol actions (want 1)")
    if len(metas) != 1:
        violations.append(f"C5: {len(metas)} metaData actions (want 1)")
    if any("remove" in a for a in actions):
        # this writer checkpoints ACTIVE state only (no tombstones)
        violations.append("C5: unexpected remove tombstones")

    # ---- C6: state equivalence --------------------------------------
    cp_files = {}
    for a in actions:
        if "add" in a:
            rel = urllib.parse.unquote(a["add"]["path"])
            if rel in cp_files:
                violations.append(f"C6: duplicate add for {rel}")
            cp_files[rel] = a["add"]
    truth_files = {
        rel: _semantic_add(a) for rel, a in truth["files"].items()
    }
    got_files = {rel: _semantic_add(a) for rel, a in cp_files.items()}
    if set(truth_files) != set(got_files):
        violations.append(
            "C6: active file set mismatch: checkpoint-only="
            f"{sorted(set(got_files) - set(truth_files))[:4]} "
            f"replay-only={sorted(set(truth_files) - set(got_files))[:4]}"
        )
    else:
        for rel in truth_files:
            if truth_files[rel] != got_files[rel]:
                violations.append(
                    f"C6: add fields diverge for {rel}: "
                    f"checkpoint={got_files[rel]} replay={truth_files[rel]}"
                )
    if protos and _strip_nulls(truth["protocol"] or
                               {"minReaderVersion": 1,
                                "minWriterVersion": 2}) != protos[0]:
        violations.append(
            f"C6: protocol diverges: checkpoint={protos[0]} "
            f"replay={truth['protocol']}"
        )
    if metas and _strip_nulls(truth["metaData"]) != metas[0]:
        violations.append(
            f"C6: metaData diverges: checkpoint={metas[0]} "
            f"replay={_strip_nulls(truth['metaData'])}"
        )
    cp_txns = {t["txn"]["appId"]: _strip_nulls(t["txn"])
               for t in actions if "txn" in t}
    if cp_txns != {k: _strip_nulls(v2_) for k, v2_ in truth["txns"].items()}:
        violations.append("C6: txn set diverges")
    cp_domains = {d["domainMetadata"]["domain"]:
                  _strip_nulls(d["domainMetadata"])
                  for d in actions if "domainMetadata" in d}
    if cp_domains != {
        k: _strip_nulls(d) for k, d in truth["domains"].items()
    }:
        violations.append("C6: domainMetadata set diverges")

    return {"path": path, "ok": not violations, "layout":
            "v2" if use_v2 else "classic", "version": v,
            "n_files": len(cp_files), "violations": violations}


def _validate_safe(p: str) -> dict:
    try:
        return validate_table(p)
    except Exception as exc:  # one broken table must not abort the audit
        return {"path": p, "ok": False,
                "violations": [f"validator error: {exc!r}"]}


def main() -> int:
    results = [_validate_safe(p) for p in sys.argv[1:]]
    ok = all(r["ok"] for r in results)
    for r in results:
        print(json.dumps(r))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
