"""Configuration for the raylink linkage pipeline.

Mirrors the tunable surface of the reference (``R/fuzzylink.R:32-45``:
``by``, ``blocking.variables``, ``learner``, ``fmla``, ``max_labels``,
``embedding_dimensions``, ``return_all_pairs``) plus the scale knobs a
distributed engine needs (tiling caps, partition counts, driver caps,
checkpointing) that the single-process reference has no analogue for.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class LinkConfig:
    # ---- semantics (reference parity; R/fuzzylink.R:32-45) ----
    by: str = "key"
    blocking: list[str] | None = None
    record_type: str = "entity"  # prompt passthrough (R/fuzzylink.R:35)
    instructions: str | None = None  # prompt passthrough (R/fuzzylink.R:36)
    learner: str = "glm"  # 'glm' | 'forest'  (R/fuzzylink.R:41)
    feature_cols: list[str] = field(default_factory=lambda: ["sim", "jw"])
    # fmla match ~ sim + jw (R/fuzzylink.R:42)
    max_labels: int = 10_000  # label budget (R/fuzzylink.R:43)
    return_all_pairs: bool = False  # (R/fuzzylink.R:17)

    # ---- active learning constants (R/fuzzylink.R:201-259) ----
    n_initial: int = 500  # n_t, initial labels (R/fuzzylink.R:203)
    # Engine improvement over the reference (documented deviation): spend
    # half the initial label budget on a similarity-stratified sample
    # instead of only per-A top-k. The reference's top-k-only seed set
    # contains almost no mid-similarity positives, so the logistic boundary
    # lands too high and prefix/abbreviation variants of already-matched A
    # records are never recovered (its recall search skips matched A's,
    # R/fuzzylink.R:399-405). Same oracle, same budget; False reproduces
    # the reference exactly.
    stratified_initial: bool = True
    al_batch_size: int = 100  # labels per iteration (R/fuzzylink.R:256)
    kernel_sd: float = 0.2  # uncertainty kernel sd on logit scale (R/fuzzylink.R:255)
    stop_threshold: float = 0.01  # glm gradient threshold (R/fuzzylink.R:254)
    stop_threshold_forest: float = 0.1  # ranger threshold (R/fuzzylink.R:259)
    window_size: int = 5  # rolling gradient window (R/fuzzylink.R:252)

    # ---- embedding (R/fuzzylink.R:39, R/get_embeddings.R) ----
    embedding_dim: int = 256
    embed_batch_size: int = 4096
    embed_concurrency: int = 4  # actor-pool size for the embedder stage

    # ---- scale knobs (no reference analogue; SURVEY.md §4) ----
    # Pair-gen tiling: split each block's A/B distinct-key sets into tiles of
    # at most `tile_rows` keys so no map_groups group emits more than
    # tile_rows^2 pairs (bounds group memory; hot-block salting).
    tile_rows: int = 2048
    # Hash-join partition count for Dataset.join stages; None = scaled to
    # the cluster CPU count (util.default_join_partitions).
    join_partitions: int | None = None
    # Target Ray Data block size (bytes) while the pair stream is live.
    # The sort-based groupby behind pair-gen coalesces output to
    # target_max_block_size; at the default 128 MiB a few-hundred-MB pair
    # stream lands in a handful of blocks and the downstream feature /
    # scoring stages lose their parallelism. 16 MiB keeps block count ≈
    # a small multiple of cluster CPUs. None = leave the global default.
    pair_block_bytes: int | None = 16 * 1024 * 1024
    # Driver caps: the slim pair table (key_a, key_b, sim, jw, block) is
    # materialized to the driver for the faithful active-learning / recall
    # loops only when its row count is below this cap; the reference holds it
    # in memory unconditionally (R/fuzzylink.R:165-199). Above the cap the
    # loops switch to the distributed primitives (active_streaming.py).
    driver_pair_cap: int = 5_000_000
    # 'auto' (driver loops under driver_pair_cap, streaming above),
    # 'driver', or 'streaming'.
    loop_mode: str = "auto"
    # Similarity floor applied at pair-gen when not None: pairs below it are
    # never emitted (scale escape hatch; None = reference parity, all
    # within-block pairs survive as in reshape2::melt, R/fuzzylink.R:165).
    sim_floor: float | None = None

    # Count + warn on NA-dropped rows like the reference (R/fuzzylink.R:61-70).
    # Costs one extra streaming pass per side; False skips the count.
    count_dropped: bool = True
    # Progress banners mirroring the reference's message() calls
    # (R/fuzzylink.R:94-100,108-114,158-164,228-234,319-334,421,486). The
    # reference defaults verbose=TRUE; the library default here is False so
    # embedded/test use stays quiet — pass True for the reference feel.
    verbose: bool = False

    # ---- determinism ----
    seed: int = 42

    # ---- checkpointing ----
    checkpoint_dir: str | None = None

    def blocking_cols(self) -> list[str]:
        return list(self.blocking) if self.blocking else []
