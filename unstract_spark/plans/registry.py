"""Stage registry — the engine's pluggable executor / tool-UDF surface.

Reference: executor plugins self-register by name and are fetched per
operation (`ExecutorRegistry.register/get`, sdk1/execution/registry.py:
1-112, loaded by workers/executor/executors/plugins/loader.py:1-81);
operations are a closed enum (extract/index/answer_prompt/
single_pass_extraction/table_extract/..., sdk1/execution/context.py:
21-37); external tools implement `BaseTool.run(settings, input_file,
output_dir)` one file at a time (sdk1/tool/base.py:1-316).

Spark-first: a *stage* is a named factory `(**config) -> (DataFrame ->
DataFrame)`. Built-in operations register at import; user plugins
register the same way (`@register_stage("my_op")`) or wrap a pandas
batch function via `register_tool_udf` — the §2.12 UDTF contract
(`Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]` with a declared
output schema), which is the reference's one-file-at-a-time tool API
re-expressed as an Arrow-batched distributed map. `compose` chains
stages into one lineage, so a registry-built pipeline is still a single
Catalyst plan (no per-stage materialization, unlike the reference's
one-process-per-hop dispatch).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

StageFn = Callable[[DataFrame], DataFrame]
StageFactory = Callable[..., StageFn]

_STAGES: dict[str, StageFactory] = {}


def register_stage(name: str) -> Callable[[StageFactory], StageFactory]:
    """Decorator: register a stage factory under `name`. Duplicate
    names are an error (same contract as the reference registry —
    registry.py:66-72)."""

    def deco(factory: StageFactory) -> StageFactory:
        if name in _STAGES:
            raise ValueError(
                f"stage {name!r} is already registered by "
                f"{_STAGES[name].__qualname__}; cannot register "
                f"{factory.__qualname__}"
            )
        _STAGES[name] = factory
        return factory

    return deco


def get_stage(name: str, **config) -> StageFn:
    """Instantiate a stage by name (fresh closure per call, like the
    reference's fresh-instance-per-get)."""
    factory = _STAGES.get(name)
    if factory is None:
        available = ", ".join(sorted(_STAGES)) or "(none)"
        raise KeyError(f"no stage registered as {name!r}. Available: {available}")
    return factory(**config)


def list_stages() -> list[str]:
    return sorted(_STAGES)


def unregister_stage(name: str) -> None:
    """Test/plugin-reload hook (reference registry.clear)."""
    _STAGES.pop(name, None)


def register_tool_udf(
    name: str, fn: Callable[[Iterator], Iterator], schema: str
) -> None:
    """Register a pandas-batch tool as a stage — the tool-plugin
    boundary. `fn` is the documented mapInPandas contract; `schema` is
    the declared output DDL (the reference's tool SPEC/PROPERTIES
    json, base.py:1-316, collapsed to the one thing Spark needs)."""

    @register_stage(name)
    def factory(**config) -> StageFn:  # noqa: ARG001 — tools take no plan-time config
        def stage(df: DataFrame) -> DataFrame:
            return df.mapInPandas(fn, schema=schema)

        return stage


def compose(*stages: tuple | str) -> StageFn:
    """Chain stages into one DataFrame transform. Each element is a
    stage name or (name, config-dict). The result is a single lineage —
    Catalyst optimizes across stage boundaries."""
    built: list[StageFn] = []
    for s in stages:
        if isinstance(s, str):
            built.append(get_stage(s))
        else:
            nm, cfg = s
            built.append(get_stage(nm, **cfg))

    def run(df: DataFrame) -> DataFrame:
        for stage in built:
            df = stage(df)
        return df

    return run


# -- built-in operations (the reference Operation enum, Spark-shaped) ----


@register_stage("extract")
def _extract_stage(**config) -> StageFn:
    from unstract_spark.operators.extract import extract_text

    return lambda df: extract_text(df, **config)


@register_stage("chunk")
def _chunk_stage(**config) -> StageFn:
    from unstract_spark.operators.chunking import chunk_fixed

    return lambda df: chunk_fixed(df, **config)


@register_stage("classify")
def _classify_stage(**config) -> StageFn:
    from unstract_spark.operators.enrich import classify_by_keywords

    return lambda df: classify_by_keywords(df, **config)


@register_stage("evaluate")
def _evaluate_stage(**config) -> StageFn:
    from unstract_spark.operators.enrich import evaluate_answers

    return lambda df: evaluate_answers(df, **config)


@register_stage("summarize")
def _summarize_stage(**config) -> StageFn:
    from unstract_spark.operators.enrich import summarize_mock

    return lambda df: summarize_mock(df, **config)


@register_stage("challenge")
def _challenge_stage(**config) -> StageFn:
    from unstract_spark.operators.enrich import challenge_mock

    return lambda df: challenge_mock(df, **config)


@register_stage("json_repair")
def _json_repair_stage(**config) -> StageFn:
    from unstract_spark.operators.enrich import repair_json_column

    return lambda df: repair_json_column(df, **config)
