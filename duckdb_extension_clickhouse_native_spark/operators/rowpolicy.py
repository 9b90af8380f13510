"""``CREATE ROW POLICY`` — ClickHouse row-level security (docs:
sql-reference/statements/create/row-policy, operations/access-rights),
as a table-directory-scoped policy catalog plus a query-time filter.

ClickHouse semantics honored:

* **Permissive by default**: several policies for the same (table,
  user) OR-combine their ``USING`` predicates.
* **Deny-by-default once policies exist**: as soon as ANY policy is
  attached to a table, a user no policy names sees ZERO rows (the
  documented ClickHouse behavior that surprises everyone).
* A table with NO policies is unrestricted for everyone.
* ``TO ALL`` policies apply to every user.

Policies persist as ``_policies.json`` inside the table directory
(the tableschema/_projection sidecar convention), so they ride along
with BACKUP/EXCHANGE like any other table metadata, and apply at plan
time as ordinary Spark SQL predicates — Catalyst pushes them into the
scan like any user filter (free pruning; zero new execution
machinery).

Reference surface: beyond-reference (server-side access control; the
reference extension has none).
"""

from __future__ import annotations

import json
import os
from typing import Optional

_POLICY_FILE = "_policies.json"


def _policy_path(table_dir: str) -> str:
    return os.path.join(table_dir, _POLICY_FILE)


def _load(table_dir: str) -> list[dict]:
    p = _policy_path(table_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)


def _store(table_dir: str, policies: list[dict]) -> None:
    tmp = _policy_path(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(policies, f, indent=1)
    os.replace(tmp, _policy_path(table_dir))


def create_row_policy(
    table_dir: str,
    name: str,
    using: str,
    *,
    to_users: Optional[list[str]] = None,
    replace: bool = False,
) -> None:
    """``CREATE ROW POLICY name ON table USING <predicate> TO users``.
    ``to_users=None`` means ``TO ALL``."""
    if not using or not using.strip():
        raise ValueError("row policy needs a USING predicate")
    policies = _load(table_dir)
    if any(p["name"] == name for p in policies):
        if not replace:
            raise ValueError(
                f"row policy {name!r} already exists (use replace=True "
                "for CREATE OR REPLACE)"
            )
        policies = [p for p in policies if p["name"] != name]
    policies.append(
        {"name": name, "using": using.strip(), "to_users": to_users}
    )
    _store(table_dir, policies)


def drop_row_policy(table_dir: str, name: str) -> None:
    policies = _load(table_dir)
    if not any(p["name"] == name for p in policies):
        raise ValueError(f"no row policy {name!r}")
    _store(table_dir, [p for p in policies if p["name"] != name])


def list_row_policies(table_dir: str) -> list[dict]:
    """system.row_policies analogue."""
    return _load(table_dir)


def policy_predicate(table_dir: str, user: str) -> Optional[str]:
    """The effective SQL predicate for ``user``: None = unrestricted
    (no policies on the table), 'false' = deny-by-default (policies
    exist, none cover the user), else the OR of the user's USING
    clauses (permissive combination)."""
    policies = _load(table_dir)
    if not policies:
        return None
    mine = [
        p["using"]
        for p in policies
        if p["to_users"] is None or user in p["to_users"]
    ]
    if not mine:
        return "false"
    return " OR ".join(f"({u})" for u in mine)


def apply_row_policies(df, table_dir: str, user: str):
    """Filter ``df`` per the table's policies for ``user`` — the
    predicate is ordinary Spark SQL, so Catalyst pushes it into the
    scan (policy filtering costs what any filter costs)."""
    pred = policy_predicate(table_dir, user)
    if pred is None:
        return df
    return df.filter(pred)
