"""Prompt-fusion planner + prompt-stage scheduling.

Two engine-level rewrites Catalyst can't do for us (SURVEY.md §4):

1. single-pass fusion (T10): when every prompt in a tool shares the
   adapter + chunk config, N per-prompt LLM calls collapse into ONE
   combined call per document (reference: legacy_executor.py:733-772
   forcing chunk_size=0, 2270-2310 combined execution). The planner
   decides per *group*, not globally — mixed configs split into one
   fused group per config.

2. variable-dependency staging (F8 hard part): prompt i may reference
   prompt j's output via {{j}} (variable_replacement.py:28-55), which
   serializes those prompts. We topologically sort prompt specs into
   stages; prompts in the same stage run fused/parallel, later stages
   see earlier outputs as substitution variables.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

VAR_RX = re.compile(r"\{\{\s*([A-Za-z_][A-Za-z0-9_]*)\s*\}\}")


@dataclass
class PromptStagePlan:
    """Ordered stages; each stage is a list of fusion groups; each
    group is a list of prompt_keys that run as one LLM call."""

    stages: list[list[list[str]]] = field(default_factory=list)


def extract_variables(prompt_text: str) -> set[str]:
    """Prompt keys this prompt depends on, across variable kinds:
    a static ``{{key}}`` depends on ``key``; a dynamic
    ``{{http://...[key]}}`` ALSO depends on ``key`` (its POST body is
    that prompt's output — reference variable_replacement.py:86-108),
    so the HTTP stage is sequenced after the producing prompt.
    custom_data vars are plan-time constants with no dependency."""
    from unstract_spark.operators.variables import DATA_RX, classify_variable
    from unstract_spark.operators.variables import VAR_RX as RAW_VAR_RX

    deps: set[str] = set()
    for var in RAW_VAR_RX.findall(prompt_text or ""):
        kind = classify_variable(var)
        if kind == "static":
            if VAR_RX.fullmatch("{{" + var + "}}"):
                deps.add(var)
        elif kind == "dynamic":
            fields = DATA_RX.findall(var)
            if fields and fields[0]:
                deps.add(fields[0])
    return deps


def plan_prompt_stages(specs: list[dict]) -> PromptStagePlan:
    """Topo-sort prompts by {{var}} dependencies, then fuse per stage.

    specs: dicts with prompt_key, prompt, chunk_size, chunk_overlap
    (adapter ids would join the group key in a multi-adapter setup).
    Raises on dependency cycles (the reference would at runtime — we
    fail at plan time).
    """
    keys = {s["prompt_key"] for s in specs}
    deps: dict[str, set[str]] = {
        s["prompt_key"]: extract_variables(s.get("prompt", "")) & keys for s in specs
    }
    by_key = {s["prompt_key"]: s for s in specs}

    plan = PromptStagePlan()
    placed: set[str] = set()
    remaining = dict(deps)
    while remaining:
        ready = sorted(k for k, d in remaining.items() if d <= placed)
        if not ready:
            raise ValueError(f"cyclic prompt dependencies among {sorted(remaining)}")
        # fuse by identical execution config within the stage
        groups: dict[tuple, list[str]] = {}
        for k in ready:
            s = by_key[k]
            gk = (s.get("chunk_size", 0), s.get("chunk_overlap", 0))
            groups.setdefault(gk, []).append(k)
        plan.stages.append([sorted(g) for _, g in sorted(groups.items())])
        placed.update(ready)
        for k in ready:
            remaining.pop(k)
    return plan


def substitute_variables(prompt_text: str, outputs: dict[str, str]) -> str:
    """Replace {{var}} with prior outputs (static variables; the
    reference's dynamic HTTP variables are an executor-side UDF)."""
    def rep(m: re.Match) -> str:
        return outputs.get(m.group(1), m.group(0))

    return VAR_RX.sub(rep, prompt_text or "")
