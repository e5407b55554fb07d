"""nexus_forge_ray — a Ray-Data-native knowledge-graph construction engine.

Re-expresses BlueBrain/nexus-forge's Mapping → Resolving → Validation → Store
lifecycle (see SURVEY.md) as streaming ``ray.data.Dataset`` pipelines over
zero-copy Arrow batches:

- :mod:`nexus_forge_ray.mapping`    — DictionaryMapping rule trees applied per batch
  (reference: kgforge/specializations/mappers/dictionaries.py:29-62)
- :mod:`nexus_forge_ray.resolving`  — entity linking strategies + actor-pool resolvers
  (reference: kgforge/specializations/resolvers/demo_resolver.py:39-79)
- :mod:`nexus_forge_ray.validation` — vectorized shape validation
  (reference: kgforge/specializations/models/demo_model.py:153-172, rdf_model.py)
- :mod:`nexus_forge_ray.store`      — versioned partitioned-Parquet store
  (reference: kgforge/specializations/stores/demo_store.py:225-337)
- :mod:`nexus_forge_ray.kg`         — triple extraction, canonicalization (MinHash-LSH +
  connected components), mention detection
- :mod:`nexus_forge_ray.ops`        — scale ops: dedup, similarity search, text analysis
- :mod:`nexus_forge_ray.pipelines`  — end-to-end flagship pipeline + relational queries
- :mod:`nexus_forge_ray.state`      — per-partition lineage manifests + checkpoint resume

No module calls ``ray.init()``; sessions are owned by the caller (driver, tests, bench).
"""

from ray.data import DataContext

__version__ = "0.1.0"


def configure(quiet: bool = True, target_max_block_size: int | None = None) -> DataContext:
    """Tune the Ray Data context for this engine. Call AFTER ray.init().

    Never called at import time — the driver owns the session.
    """
    ctx = DataContext.get_current()
    if quiet:
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
    ctx.execution_options.preserve_order = False
    if target_max_block_size is not None:
        ctx.target_max_block_size = target_max_block_size
    return ctx
