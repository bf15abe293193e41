#!/usr/bin/env python
"""Independent structural validator for the CDC WRITE surface
(round 11, verdict ask #3 — the _change_data mirror of
tools/v2_checkpoint_validator.py).

The round-10 change-data-feed WRITE layout (cdc actions, _change_data/
parquet files, physical column names under columnMapping) earned trust
via the engine's own two readers plus the fuzzer's snapshot algebra —
strong, but the Spark reader and the pyarrow reader share
delta_lite.py/cdf_arrow.py state logic, so a layout bug both readers
agree on would pass. This tool validates the ON-DISK layout against the
PUBLIC protocol rules (delta.io PROTOCOL.md, "Add CDC File" and
"Change Data Files" sections) using ONLY pyarrow + json — it never
imports lcr_etl_upgrade_spark, mirroring the codec_differential /
v2_checkpoint_validator standard (independent implementation, no shared
code with the thing under test).

Checks, per commit of each table:
  W1  every `cdc` action: path URL-unquotes to a file under
      `_change_data/` that EXISTS; on-disk size equals `size`;
      `dataChange` is false (the spec: cdc actions never change state).
  W2  change-file parquet schema: exactly the PHYSICAL non-partition
      column names of the commit's effective metaData (columnMapping
      name/id modes resolve delta.columnMapping.physicalName; none mode
      uses logical names) plus `_change_type`; partitionValues keys
      equal the physical partition column names and match the
      hive-style `k=v` directories of the file's own path.
  W3  `_change_type` values read from the change files are inside the
      protocol domain {insert, delete, update_preimage,
      update_postimage}.
  W4  cdc actions appear ONLY in commits whose effective metadata has
      delta.enableChangeDataFeed=true.
  W5  commits whose file actions are all dataChange=false (OPTIMIZE /
      compaction layout moves) carry NO cdc actions — the feed must
      stay blind to rewrites.
  W6  reconciliation against an INDEPENDENT replay (this file's own
      tracking of active path -> (rowcount, DV cardinality) from
      parquet footers + action descriptors): for a cdc-carrying commit,
      the change files' `delete` row count must equal the rows this
      commit newly deleted (DV-cardinality growth on re-added paths +
      full content of removed-not-re-added paths), and the `insert`
      row count the rows newly inserted (dataChange adds of fresh
      paths, net of their DVs). Rewrite-shaped commits (UPDATE / MERGE
      / merge-delete: removes whose paths are not re-added plus
      fresh-path adds) re-add every surviving row, so they reconcile
      on NET movement instead — removed_live - added_live must equal
      cdc deletes - cdc inserts, update_preimage must pair 1:1 with
      update_postimage, and modified rows (pre + delete) can never
      exceed the live rows rewritten.
  W7  `_change_data/` files are never referenced by add/remove actions
      (change files live outside table state).
  W9  UPDATE/MERGE commits on a CDF-enabled table must carry cdc
      actions (the protocol makes change data mandatory for
      update-shaped operations; add/remove derivation is only the
      reader fallback and misreports rewrites as churn).
  W8  on a CDF-enabled table, a dataChange commit that removes AND
      re-adds the SAME path (a DV update — the one shape whose naive
      add/remove derivation double-counts) MUST carry cdc actions.

Usage:
    python tools/cdf_write_validator.py TABLE_PATH [TABLE_PATH ...]

Prints one JSON line per table; exit 1 on any violation.
"""

from __future__ import annotations

import json
import os
import re
import sys
import urllib.parse

import pyarrow.parquet as pq

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"
_CHANGE_TYPES = {"insert", "delete", "update_preimage", "update_postimage"}


def _physical_fields(meta: dict) -> tuple[list[str], list[str]]:
    """(physical non-partition column names, physical partition column
    names) for a metaData action, resolving columnMapping physical
    names when the mode is name/id."""
    schema = json.loads(meta["schemaString"])
    mode = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    logical_parts = list(meta.get("partitionColumns") or [])
    phys: dict[str, str] = {}
    for f in schema.get("fields", []):
        name = f["name"]
        if mode in ("name", "id"):
            p = (f.get("metadata") or {}).get(
                "delta.columnMapping.physicalName"
            )
            phys[name] = p if p is not None else name
        else:
            phys[name] = name
    part_phys = [phys[c] for c in logical_parts if c in phys]
    data_phys = [
        phys[f["name"]]
        for f in schema.get("fields", [])
        if f["name"] not in logical_parts
    ]
    return data_phys, part_phys


def _partition_values_from_rel(rel: str, part_cols: list[str]) -> dict:
    values: dict[str, str | None] = {}
    for seg in rel.replace("\\", "/").split("/")[:-1]:
        k, _, v = seg.partition("=")
        if k in part_cols:
            v = urllib.parse.unquote(v)
            values[k] = None if v == _HIVE_NULL else v
    return {c: values.get(c) for c in part_cols}


def validate_table(path: str) -> list[dict]:
    """All W1-W9 violations for one table, [] when clean."""
    out: list[dict] = []
    log_dir = os.path.join(path, "_delta_log")
    if not os.path.isdir(log_dir):
        return [{"check": "table", "detail": f"no _delta_log in {path!r}"}]
    commits = sorted(
        (int(m.group(1)), os.path.join(log_dir, f))
        for f in os.listdir(log_dir)
        if (m := _COMMIT_RE.match(f))
    )
    meta: dict | None = None
    cdf_on = False
    # independent state: active path -> (num_rows, dv_cardinality)
    state: dict[str, tuple[int, int]] = {}

    def rows_of(rel: str) -> int | None:
        p = os.path.join(path, rel)
        if not os.path.isfile(p):
            return None
        return pq.ParquetFile(p).metadata.num_rows

    for v, cpath in commits:
        with open(cpath) as fh:
            actions = [json.loads(ln) for ln in fh if ln.strip()]
        for a in actions:
            if "metaData" in a:
                meta = a["metaData"]
                cdf_on = str(
                    (meta.get("configuration") or {}).get(
                        "delta.enableChangeDataFeed", ""
                    )
                ).lower() == "true"
        adds = [a["add"] for a in actions if "add" in a]
        removes = [a["remove"] for a in actions if "remove" in a]
        cdcs = [a["cdc"] for a in actions if "cdc" in a]

        data_phys, part_phys = (
            _physical_fields(meta) if meta else ([], [])
        )

        # ---- W7: change files never in table state -----------------------
        for act, kind in [(a, "add") for a in adds] + [
            (r, "remove") for r in removes
        ]:
            rel = urllib.parse.unquote(act["path"])
            if rel.startswith("_change_data/"):
                out.append({
                    "check": "W7", "version": v, "kind": kind,
                    "detail": f"{kind} references change file {rel!r}",
                })

        # ---- W4 / W5 ------------------------------------------------------
        if cdcs and not cdf_on:
            out.append({
                "check": "W4", "version": v,
                "detail": "cdc actions on a commit whose effective "
                          "metadata has no delta.enableChangeDataFeed",
            })
        file_flags = [bool(a.get("dataChange")) for a in adds] + [
            bool(r.get("dataChange")) for r in removes
        ]
        if cdcs and file_flags and not any(file_flags):
            out.append({
                "check": "W5", "version": v,
                "detail": "cdc actions on a pure dataChange=false "
                          "(layout-move) commit",
            })

        # ---- W1/W2/W3 + change-row counting -------------------------------
        counts = {t: 0 for t in _CHANGE_TYPES}
        bad_commit_cdc = False
        for c in cdcs:
            rel = urllib.parse.unquote(c["path"])
            full = os.path.join(path, rel)
            if c.get("dataChange") not in (False, None):
                out.append({
                    "check": "W1", "version": v,
                    "detail": f"cdc {rel!r} claims dataChange=true",
                })
            if not rel.startswith("_change_data/"):
                out.append({
                    "check": "W1", "version": v,
                    "detail": f"cdc path {rel!r} not under _change_data/",
                })
                bad_commit_cdc = True
                continue
            if not os.path.isfile(full):
                out.append({
                    "check": "W1", "version": v,
                    "detail": f"cdc file {rel!r} missing on disk",
                })
                bad_commit_cdc = True
                continue
            if os.path.getsize(full) != int(c.get("size", -1)):
                out.append({
                    "check": "W1", "version": v,
                    "detail": f"cdc {rel!r} size "
                              f"{os.path.getsize(full)} != action "
                              f"{c.get('size')}",
                })
            pf = pq.ParquetFile(full)
            names = list(pf.schema_arrow.names)
            want = set(data_phys) | {"_change_type"}
            if set(names) != want:
                out.append({
                    "check": "W2", "version": v,
                    "detail": f"cdc {rel!r} columns {sorted(names)} != "
                              f"expected physical {sorted(want)}",
                })
            pv = c.get("partitionValues") or {}
            if sorted(pv) != sorted(part_phys):
                out.append({
                    "check": "W2", "version": v,
                    "detail": f"cdc {rel!r} partitionValues keys "
                              f"{sorted(pv)} != physical partition "
                              f"columns {sorted(part_phys)}",
                })
            elif part_phys:
                from_path = _partition_values_from_rel(
                    rel[len("_change_data/"):], part_phys
                )
                if from_path != {k: pv.get(k) for k in part_phys}:
                    out.append({
                        "check": "W2", "version": v,
                        "detail": f"cdc {rel!r} partitionValues {pv} "
                                  f"disagree with path {from_path}",
                    })
            tbl = pq.read_table(full, columns=["_change_type"])
            for t in tbl.column("_change_type").to_pylist():
                if t not in _CHANGE_TYPES:
                    out.append({
                        "check": "W3", "version": v,
                        "detail": f"cdc {rel!r} _change_type {t!r} "
                                  "outside protocol domain",
                    })
                    bad_commit_cdc = True
                else:
                    counts[t] += 1

        # ---- independent replay diff for W6/W8 ----------------------------
        removed_paths = {
            urllib.parse.unquote(r["path"]): bool(r.get("dataChange"))
            for r in removes
        }
        added_paths = {
            urllib.parse.unquote(a["path"]): a for a in adds
        }
        dv_update_paths = [
            p for p, dc in removed_paths.items()
            if dc and p in added_paths
            and bool(added_paths[p].get("dataChange"))
        ]
        derived_ins = 0
        derived_del = 0
        derivable = True
        for rel, dc in removed_paths.items():
            if not dc:
                continue
            old = state.get(rel)
            if old is None:
                derivable = False
                continue
            old_rows, old_card = old
            if rel in added_paths and bool(
                added_paths[rel].get("dataChange")
            ):
                new_card = int(
                    (added_paths[rel].get("deletionVector") or {}).get(
                        "cardinality", 0
                    )
                )
                derived_del += max(0, new_card - old_card)
            else:
                derived_del += max(0, old_rows - old_card)
        for rel, a in added_paths.items():
            if not bool(a.get("dataChange")):
                continue
            if rel in removed_paths:
                continue  # DV update handled above
            if rel in state:
                continue  # re-add of live path: no new rows
            n = rows_of(rel)
            if n is None:
                derivable = False
                continue
            card = int(
                (a.get("deletionVector") or {}).get("cardinality", 0)
            )
            derived_ins += max(0, n - card)

        if cdcs and not bad_commit_cdc:
            if counts["update_preimage"] or counts["update_postimage"]:
                # rewrite-path UPDATE (r11) or MERGE (r12): touched
                # files rewrite in full, so the independent replay's
                # net row movement must reconcile with the change rows:
                #   removed_live - added_live == delete_rows - insert_rows
                # (pure UPDATE conserves: 0 == 0; MERGE's deletes and
                # inserts shift the balance exactly). The authoritative
                # change files carry ONLY the modified rows — pre/post
                # pairs plus any merge insert/delete rows.
                if counts["update_preimage"] != counts["update_postimage"]:
                    out.append({
                        "check": "W6", "version": v,
                        "detail": f"update_preimage rows "
                                  f"{counts['update_preimage']} != "
                                  f"update_postimage rows "
                                  f"{counts['update_postimage']}",
                    })
                if derivable and (derived_del - derived_ins) != (
                    counts["delete"] - counts["insert"]
                ):
                    out.append({
                        "check": "W6", "version": v,
                        "detail": f"rewrite commit does not reconcile: "
                                  f"removed {derived_del} - added "
                                  f"{derived_ins} != cdc deletes "
                                  f"{counts['delete']} - cdc inserts "
                                  f"{counts['insert']}",
                    })
                if derivable and (
                    counts["update_preimage"] + counts["delete"]
                    > derived_del
                ):
                    out.append({
                        "check": "W6", "version": v,
                        "detail": f"more modified rows (pre "
                                  f"{counts['update_preimage']} + del "
                                  f"{counts['delete']}) than live rows "
                                  f"rewritten ({derived_del})",
                    })
            elif derivable:
                # a rewrite-shaped commit (removes whose paths are NOT
                # re-added alongside fresh-path adds — merge clauses
                # that only delete) re-adds every surviving row, so
                # only the NET movement reconciles; pure append/DV
                # shapes still check exactly
                rewrite_shape = any(
                    dc and p not in added_paths
                    for p, dc in removed_paths.items()
                ) and any(
                    bool(a.get("dataChange")) and p not in removed_paths
                    and p not in state
                    for p, a in added_paths.items()
                )
                if rewrite_shape:
                    if (derived_del - derived_ins) != (
                        counts["delete"] - counts["insert"]
                    ):
                        out.append({
                            "check": "W6", "version": v,
                            "detail": f"rewrite commit does not "
                                      f"reconcile: removed "
                                      f"{derived_del} - added "
                                      f"{derived_ins} != cdc deletes "
                                      f"{counts['delete']} - cdc "
                                      f"inserts {counts['insert']}",
                        })
                    if counts["delete"] > derived_del:
                        out.append({
                            "check": "W6", "version": v,
                            "detail": f"more cdc delete rows "
                                      f"({counts['delete']}) than live "
                                      f"rows rewritten ({derived_del})",
                        })
                else:
                    if counts["delete"] != derived_del:
                        out.append({
                            "check": "W6", "version": v,
                            "detail": f"cdc delete rows "
                                      f"{counts['delete']} != "
                                      f"independently derived "
                                      f"{derived_del}",
                        })
                    if counts["insert"] != derived_ins:
                        out.append({
                            "check": "W6", "version": v,
                            "detail": f"cdc insert rows "
                                      f"{counts['insert']} != "
                                      f"independently derived "
                                      f"{derived_ins}",
                        })
        # ---- W9: UPDATE/MERGE commits on a CDF table must carry their
        # change files (delta.io writer requirement: change data is
        # MANDATORY for update-shaped operations when
        # enableChangeDataFeed=true — derivation from add/remove is
        # only the reader fallback for legacy/append shapes, and for a
        # rewrite it reports every unchanged row as delete+insert
        # churn). The operation name is writer-claimed, which is the
        # point: claiming MERGE while omitting the protocol's
        # obligation is exactly the writer bug this catches.
        op_name = next(
            (
                (a.get("commitInfo") or {}).get("operation")
                for a in actions
                if "commitInfo" in a
            ),
            None,
        )
        if (
            cdf_on
            and op_name in ("UPDATE", "MERGE")
            and not cdcs
            and (
                any(bool(x.get("dataChange")) for x in adds)
                or any(bool(x.get("dataChange")) for x in removes)
            )
        ):
            out.append({
                "check": "W9", "version": v,
                "detail": f"{op_name} commit on a CDF-enabled table "
                          "carries no cdc actions — change data is "
                          "mandatory for update-shaped operations",
            })
        if cdf_on and dv_update_paths and not cdcs:
            out.append({
                "check": "W8", "version": v,
                "detail": f"DV update of {dv_update_paths[:3]} on a "
                          "CDF-enabled table without cdc actions "
                          "(derivation would double-count)",
            })

        # ---- advance independent state ------------------------------------
        for rel, dc in removed_paths.items():
            if rel in state and rel not in added_paths:
                del state[rel]
        for rel, a in added_paths.items():
            n = rows_of(rel)
            if n is None:
                continue
            card = int(
                (a.get("deletionVector") or {}).get("cardinality", 0)
            )
            state[rel] = (n, card)

    return out


def main() -> int:
    ok = True
    for path in sys.argv[1:]:
        violations = validate_table(path)
        print(json.dumps({
            "table": path, "ok": not violations,
            "violations": violations,
        }))
        ok = ok and not violations
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
