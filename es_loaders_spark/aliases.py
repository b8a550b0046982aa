"""Index aliases: named pointers with atomic multi-action swap.

ES's ``_aliases`` API is how users cut over to a rebuilt index with zero
downtime (reindex → POST _aliases {remove old, add new} — one atomic
step). The reference relies on exactly this shape for its dashboard
reloads (mira/elasticsearch.py clean-reload pattern: delete + reload
under the same logical name).

Here the registry is one JSON file (``aliases.json``) in a caller-chosen
directory, updated with the same tmpfile + ``os.replace`` protocol the
index manifests use — readers see the old mapping or the new mapping,
never a partial one. An alias resolves to an index directory; every
engine entry point that takes ``index_dir`` accepts a resolved alias.

Multi-index aliases (one alias → many indexes, ES fan-out semantics) are
out of scope: this engine's generations already provide the union-read
use case, and a fan-out alias would silently double-count df/stats.
Adding an alias that already exists to a different index requires
``remove`` in the same action list (ES errors likewise unless
``is_write_index`` juggling is involved).
"""

from __future__ import annotations

import json
import os
import tempfile

ALIASES_FILE = "aliases.json"


def get_aliases(registry_dir: str) -> dict[str, str]:
    """The committed alias → index_dir mapping (empty if none yet)."""
    path = os.path.join(registry_dir, ALIASES_FILE)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def resolve_alias(registry_dir: str, name: str) -> str:
    """Alias → index_dir; a name that IS an index dir passes through,
    so call sites can accept either."""
    aliases = get_aliases(registry_dir)
    if name in aliases:
        return aliases[name]
    if os.path.exists(os.path.join(name, "stats.json")):
        return name
    raise KeyError(
        f"{name!r} is neither an alias in {registry_dir!r} nor an index dir"
    )


def update_aliases(registry_dir: str, actions: list[dict]) -> dict[str, str]:
    """Apply an ES-style actions list ATOMICALLY (all or nothing).

    ``[{"add": {"alias": a, "index": dir}}, {"remove": {"alias": a,
    "index": dir}}]`` — the whole list validates against the current
    mapping first, then one ``os.replace`` commits the result. The
    classic cutover (remove old + add new under one name) is therefore
    a single visibility point, exactly ES's guarantee.
    """
    os.makedirs(registry_dir, exist_ok=True)
    aliases = get_aliases(registry_dir)
    out = dict(aliases)
    for action in actions:
        if len(action) != 1:
            raise ValueError(f"each action is one of add/remove: {action}")
        (op, spec), = action.items()
        name, index = spec["alias"], spec.get("index")
        if op == "add":
            if index is None:
                raise ValueError(f"add needs an index: {action}")
            if not os.path.exists(os.path.join(index, "stats.json")):
                raise ValueError(
                    f"alias {name!r} target {index!r} is not a built index "
                    "(no stats.json)"
                )
            if name in out and out[name] != index:
                raise ValueError(
                    f"alias {name!r} already points at {out[name]!r}; "
                    "remove it in the same actions list to swap"
                )
            out[name] = index
        elif op == "remove":
            if name not in out:
                raise ValueError(f"alias {name!r} does not exist")
            if index is not None and out[name] != index:
                raise ValueError(
                    f"alias {name!r} points at {out[name]!r}, not {index!r}"
                )
            del out[name]
        else:
            raise ValueError(f"unsupported alias action {op!r}")
    path = os.path.join(registry_dir, ALIASES_FILE)
    fd, tmp = tempfile.mkstemp(dir=registry_dir, suffix=".aliases.tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return out
