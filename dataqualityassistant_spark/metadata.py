"""Rule metadata store: the library/CLI analog of the reference's
rule-management API surface (reference ``app/main.py:1073-1309`` CRUD,
``:1213-1231`` version bumps, ``:552-786`` apply-suggestions,
``:264-281/1515-1540`` duplicate-suite detection).

Rules and versions are driver-side metadata (KBs); they persist as JSON
files under a directory (swap for an Iceberg/Delta metadata table on a real
deployment — the semantics here are the contract):

- every create/update appends an immutable ``rule_versions`` snapshot with a
  monotonically increasing ``version_number``;
- exactly one version per rule has ``is_current=True`` (flip-then-insert,
  reference ``app/main.py:1227-1229``);
- legacy single-dict configs are coerced to lists on read (``:1082-1086``);
- duplicate detection compares normalized expectation suites exactly;
- drafts: created when NL confidence < 70 or columns are missing
  (``:1507-1509``); ``finish_draft`` validates columns incl. ``compare_to``
  (``:1604-1623``) and promotes confidence to 100.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

from dataqualityassistant_spark.rules import Expectation, Rule, RuleVersion, normalize_rule_config


def _suite_key(expectations: list[Expectation]) -> str:
    """Canonical form for exact-duplicate suite detection."""
    return json.dumps(
        sorted(
            (e.expectation_type, json.dumps(e.kwargs, sort_keys=True))
            for e in expectations
        )
    )


class RuleStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._rules_path = os.path.join(root, "rules.json")
        self._versions_path = os.path.join(root, "rule_versions.json")

    # ------------------------------------------------------------- storage

    def _load(self, path: str) -> list[dict]:
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return json.load(f)

    def _save(self, path: str, rows: list[dict]) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.root)
        with os.fdopen(fd, "w") as f:
            json.dump(rows, f, indent=1, default=str)
        os.replace(tmp, path)

    # --------------------------------------------------------------- reads

    def list_rules(self, table_name: str | None = None, active_only: bool = False) -> list[Rule]:
        rules = [self._to_rule(r) for r in self._load(self._rules_path)]
        if table_name is not None:
            rules = [r for r in rules if r.table_name == table_name]
        if active_only:
            rules = [r for r in rules if r.is_active and not r.is_draft]
        return rules

    def get_rule(self, rule_id: int) -> Rule | None:
        for r in self._load(self._rules_path):
            if r["id"] == rule_id:
                return self._to_rule(r)
        return None

    def versions(self, rule_id: int) -> list[RuleVersion]:
        out = [
            RuleVersion(rule_id=v["rule_id"], version_number=v["version_number"],
                        rule_config=v["rule_config"], is_current=v["is_current"],
                        created_at=v.get("created_at"))
            for v in self._load(self._versions_path)
            if v["rule_id"] == rule_id
        ]
        out.sort(key=lambda v: v.version_number, reverse=True)
        return out

    def _to_rule(self, row: dict) -> Rule:
        return Rule(
            id=row["id"], name=row["name"], table_name=row.get("table_name", ""),
            description=row.get("description", ""),
            rule_config=row.get("rule_config"),
            is_active=row.get("is_active", True), is_draft=row.get("is_draft", False),
            confidence=row.get("confidence"),
            # persisted on every create/update — reads must surface them or
            # every rule reports a None age despite the data being on disk
            created_at=row.get("created_at"), updated_at=row.get("updated_at"),
        )

    # -------------------------------------------------------------- writes

    def create_rule(self, name: str, table_name: str, rule_config: Any,
                    description: str = "", confidence: int | None = None,
                    is_draft: bool = False, run_ts: str = "") -> Rule:
        expectations = normalize_rule_config(rule_config)
        rows = self._load(self._rules_path)
        rule_id = max((r["id"] for r in rows), default=0) + 1
        rule = Rule(id=rule_id, name=name, table_name=table_name,
                    description=description,
                    rule_config=[e.to_dict() for e in expectations],
                    confidence=confidence, is_draft=is_draft)
        rows.append({**rule.to_dict(), "created_at": run_ts, "updated_at": run_ts})
        self._save(self._rules_path, rows)
        self._append_version(rule_id, rule.config_json(), run_ts)
        return rule

    def update_rule(self, rule_id: int, rule_config: Any, run_ts: str = "") -> Rule:
        expectations = normalize_rule_config(rule_config)
        rows = self._load(self._rules_path)
        for r in rows:
            if r["id"] == rule_id:
                r["rule_config"] = [e.to_dict() for e in expectations]
                r["updated_at"] = run_ts
                self._save(self._rules_path, rows)
                self._append_version(rule_id, json.dumps(r["rule_config"]), run_ts)
                return self._to_rule(r)
        raise KeyError(f"rule {rule_id} not found")

    def delete_rule(self, rule_id: int) -> None:
        """Delete cascades to versions (reference app/main.py:1297-1301)."""
        self._save(self._rules_path,
                   [r for r in self._load(self._rules_path) if r["id"] != rule_id])
        self._save(self._versions_path,
                   [v for v in self._load(self._versions_path) if v["rule_id"] != rule_id])

    def _append_version(self, rule_id: int, config_json: str, run_ts: str) -> None:
        versions = self._load(self._versions_path)
        n = max((v["version_number"] for v in versions if v["rule_id"] == rule_id), default=0) + 1
        for v in versions:  # exactly one current per rule
            if v["rule_id"] == rule_id:
                v["is_current"] = False
        versions.append({"rule_id": rule_id, "version_number": n,
                         "rule_config": config_json, "is_current": True,
                         "created_at": run_ts})
        self._save(self._versions_path, versions)

    # ------------------------------------------------------------ workflows

    def find_duplicate(self, table_name: str, rule_config: Any) -> Rule | None:
        key = _suite_key(normalize_rule_config(rule_config))
        for rule in self.list_rules(table_name):
            if _suite_key(rule.expectations) == key:
                return rule
        return None

    def apply_suggestions(self, suggestions: list[dict], min_confidence: int = 0,
                          run_ts: str = "") -> list[Rule]:
        """Persist suggestions (from profiling.suggest_rules), skipping exact
        duplicates — the apply-suggested-rules semantics (app/main.py:552-786);
        auto-apply filtering by confidence ≥90 mirrors app/main.py:1024-1032."""
        created = []
        for s in suggestions:
            if s.get("confidence", 0) < min_confidence:
                continue
            if self.find_duplicate(s.get("table_name", ""), s["rule_config"]):
                continue
            created.append(self.create_rule(
                name=s["rule_name"], table_name=s.get("table_name", ""),
                rule_config=s["rule_config"], description=s.get("reason", ""),
                confidence=s.get("confidence"), run_ts=run_ts))
        return created

    def create_from_description(self, description: str, table_name: str,
                                columns: list[str], run_ts: str = "") -> Rule | None:
        """NL → rule with draft gating (reference app/main.py:1413-1583):
        draft when confidence < 70 or referenced columns missing."""
        from dataqualityassistant_spark.profiling import rule_from_description

        parsed = rule_from_description(description, columns)
        if parsed is None:
            return None
        confidence = parsed.pop("confidence", 0)
        exp = Expectation(parsed["expectation_type"], parsed["kwargs"])
        missing = [c for c in exp.columns_referenced() if c not in columns]
        is_draft = bool(missing) or confidence < 70
        return self.create_rule(
            name=f"nl_{exp.expectation_type}_{exp.column or 'rule'}",
            table_name=table_name, rule_config=[exp], description=description,
            confidence=confidence, is_draft=is_draft, run_ts=run_ts)

    def finish_draft(self, rule_id: int, columns: list[str], run_ts: str = "") -> Rule:
        """Validate all referenced columns (incl. compare_to) exist, then
        promote: draft→active, confidence→100 (app/main.py:1585-1671)."""
        rule = self.get_rule(rule_id)
        if rule is None:
            raise KeyError(f"rule {rule_id} not found")
        missing = [c for e in rule.expectations for c in e.columns_referenced()
                   if c not in columns]
        if missing:
            raise ValueError(f"columns not in table: {missing}")
        rows = self._load(self._rules_path)
        for r in rows:
            if r["id"] == rule_id:
                r["is_draft"] = False
                r["confidence"] = 100
                r["updated_at"] = run_ts
        self._save(self._rules_path, rows)
        return self.get_rule(rule_id)
