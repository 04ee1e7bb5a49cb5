"""End-to-end preprocessing pipelines (the engine's flagship dataflow).

Spark-first re-expression of the reference pipeline
(/root/reference/src/process_nwb/pipelines.py:15-111):

    scan -> x1e6 scale -> resample(initial_rate) -> notch(60) ->
    subtract_CAR(0.95) -> wavelet(filters, hg_only) -> |.| ->
    resample(final_rate) [-> z-score -> band mean]

Everything is a lazily-composed DataFrame transformation; Catalyst fuses
the narrow stages. `all_steps=True` materializes named intermediates with
the reference's lineage names (downsampled_X, CAR_ln_X, wvlt_amp_X —
resample.py:196, pipelines.py:148, wavelet_transform.py:389), the catalog
analog of the NWB processing module.

Physical plan (2 shuffles on the packed layout — SURVEY.md §3, improved):
  pack (shuffle 1: long rows -> one array row per channel) ->
  [resample+notch fused kernel, narrow] ->
  packed CAR (shuffle 2: n_channels array rows per series — NOT the long
  rows; the relational window CAR would shuffle n_time*n_channels rows) ->
  wavelet kernel (narrow, fans out to bands) -> unpack -> relational tail.
With `fuse=False` the original 3-shuffle relational-CAR plan runs instead
(it materializes the long intermediates the `all_steps` catalog needs).
"""
from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dsp import kernels as K
from .operators.car import subtract_car, subtract_car_packed
from .operators.kernel_ops import (car_wavelet_arrow, car_wavelet_op,
                                   fused_ops, fused_ops_arrow, notch_op,
                                   resample_op, scale_packed, wavelet_op)
from .operators.repack import pack, unpack
from .operators.zscore import band_mean, high_gamma_packed, zscore_baseline

SCALING = 1e6  # V -> uV, resample.py:11


@dataclass
class PreprocessResult:
    """Lazily-composed stage DataFrames, lineage-named like the reference."""
    tf: DataFrame                       # long (series_id, channel, band, cf, sd, sample_idx, amp)
    stages: dict = field(default_factory=dict)
    tf_packed: DataFrame | None = None  # (series_id, channel, band, cf, sd, amp ARRAY)

    def materialize(self, spark, base_name: str = "ECoG"):
        """`all_steps` analog: register every stage as a temp view with the
        reference's lineage naming (pipelines.py:69-82)."""
        for name, df in self.stages.items():
            df.createOrReplaceTempView(f"{name}_{base_name}")
        return sorted(f"{n}_{base_name}" for n in self.stages)


def preprocess(signals: DataFrame, rate: float,
               initial_resample_rate: float = 3200.0,
               final_resample_rate: float = 400.0,
               filters: str = "rat", hg_only: bool = True,
               mean_frac: float = 0.95, scaling: float = SCALING,
               abs_only: bool = True, precision: str = "single",
               fuse: bool = True, arrow: bool = True,
               segmented: bool = False, seg_len: int | None = None,
               seg_overlap: int = 4096) -> PreprocessResult:
    """The default pipeline on a long signals DataFrame
    (series_id, channel, sample_idx, value). Parity: pipelines.py:15-111.

    `arrow=True` (default) runs the two kernel crossings — resample+notch
    and CAR->wavelet — through the Arrow-native operators (mapInArrow /
    applyInArrow): same math, same plan shape, but signal arrays cross as
    flat float64 buffers + offsets instead of pandas object Series of
    boxed per-row ndarrays, in both directions. Measured (8 series x 32 ch
    x 10 s @ 3.2 kHz, interleaved min-of-5): 2.55 s pandas -> 2.11 s
    arrow, bringing the pipeline to 1.34x the serial single-core NumPy
    replay of the same workload. (An Arrow-native pack was also tried and
    measured STRICTLY worse — 2.6 s vs 0.8 s for the JVM collect_list
    pack — because it pays a full extra Python round-trip of the packed
    arrays; the JVM pack stays regardless of `arrow`.) `arrow=False`
    keeps the pandas operators — both paths are pinned near-bitwise-equal
    (1e-12 at double; the FFT itself has 1-2 ULP run-to-run alignment
    jitter, so exact bitwise across executions is unattainable) in
    tests/test_spark_operators.py.

    `segmented=True` (or any explicit `seg_len`) routes the whole pipeline
    through the overlap-segmented operators (operators/segmented.py): no
    stage ever holds a full channel in one task, so a channel of 10^8+
    samples processes in bounded memory — the escape hatch SCALE.md's
    "Memory bound" section promises. Numerics are equivalent-but-not-
    bitwise vs this whole-channel path (segment-local FFT grids);
    boundary error is inside the reference's own chunked-vs-dense bound
    (rtol=0.01, reference tests/test_pipeline.py:154), pinned e2e in
    tests/test_pipeline.py. Requires abs_only=True (the final resample
    runs inside the pipeline, and resampled phase is meaningless — the
    same constraint the reference enforces, wavelet_transform.py:389).
    """
    if segmented or seg_len is not None:
        if not abs_only:
            raise ValueError(
                "segmented preprocess always post-resamples, which is "
                "incompatible with phase output; use abs_only=True")
        if not fuse:
            # fuse=False exists to materialize the unfused 'downsampled'
            # lineage stage, which the segmented plan never produces —
            # failing loudly beats a downstream KeyError on res.stages
            raise ValueError(
                "segmented preprocess does not materialize the unfused "
                "(fuse=False) lineage stages; run fuse=True, or run the "
                "whole-channel path for --all_steps-style lineage")
        # `arrow` is irrelevant here (the segment kernels are
        # applyInPandas-grouped); accepted and ignored by design
        return _preprocess_segmented(
            signals, rate, initial_resample_rate, final_resample_rate,
            filters=filters, hg_only=hg_only, mean_frac=mean_frac,
            scaling=scaling, precision=precision, seg_len=seg_len,
            seg_overlap=seg_overlap)
    stages: dict[str, DataFrame] = {}

    use_arrow = arrow and fuse and abs_only
    packed = pack(signals)
    packed = scale_packed(packed, scaling)
    if fuse:
        kernel_map = fused_ops_arrow if use_arrow else fused_ops
        ds = kernel_map(
            packed,
            lambda x: K.resample(x, initial_resample_rate, rate,
                                 precision=precision),
            lambda x: K.apply_linenoise_notch(x, initial_resample_rate,
                                              precision=precision),
        )
        # dense CAR on packed rows: shuffle = n_channels array rows/series.
        # The lineage stage stays separately addressable (lazy — only pays
        # if materialized); the pipeline output itself uses the fused
        # CAR->wavelet kernel below (one Python crossing for both).
        repacked = subtract_car_packed(ds, mean_frac=mean_frac,
                                       precision=precision)
        stages["CAR_ln_downsampled"] = unpack(repacked)
        car_wavelet = car_wavelet_arrow if use_arrow else car_wavelet_op
        wv = car_wavelet(ds, initial_resample_rate, mean_frac=mean_frac,
                         filters=filters, hg_only=hg_only,
                         abs_only=abs_only,
                         post_resample_rate=final_resample_rate,
                         precision=precision)
    else:
        ds = resample_op(packed, initial_resample_rate, rate,
                         precision=precision)
        stages["downsampled"] = unpack(ds)
        ds = notch_op(ds, initial_resample_rate, precision=precision)
        long_ds = unpack(ds)
        car_ln = subtract_car(long_ds, mean_frac=mean_frac)
        stages["CAR_ln_downsampled"] = car_ln
        repacked = pack(car_ln)
        wv = wavelet_op(repacked, initial_resample_rate, filters=filters,
                        hg_only=hg_only, abs_only=abs_only,
                        post_resample_rate=final_resample_rate,
                        precision=precision)
    tf = unpack(wv.drop("phase"), values_col="amp", value_col="amp",
                extra_keys=("band", "cf", "sd"))
    stages["wvlt_amp"] = tf
    if not abs_only:
        # the reference stores phase as its own wvlt_phase_ series
        # (wavelet_transform.py:422-436); dropping it unconditionally
        # would make abs_only=False pay the np.angle computation and then
        # discard the result
        stages["wvlt_phase"] = unpack(
            wv.drop("amp"), values_col="phase", value_col="phase",
            extra_keys=("band", "cf", "sd"))
    return PreprocessResult(tf=tf, stages=stages,
                            tf_packed=wv if not abs_only
                            else wv.drop("phase"))


def _snap_seg_len(base: int, new_freq: float, old_freq: float) -> int:
    """Segment length for one pipeline stage: smallest multiple of the
    reduced rate-ratio denominator >= base (the segmented operators'
    exactness rule — operators/segmented.py:_validate), and at least TWO
    denominators, so a valid overlap (itself forced to a denominator
    multiple by snap_overlap) always fits under the overlap < seg_len
    validation. seg_len is a memory-bound knob, not semantics, so
    snapping UP is always safe."""
    from .operators.segmented import ratio_denominator, snap_to_ratio

    d = ratio_denominator(new_freq, old_freq)
    return snap_to_ratio(max(int(base), 2 * d), new_freq, old_freq,
                         cap=10 ** 8, what="seg_len")


def _preprocess_segmented(signals: DataFrame, rate: float,
                          initial_resample_rate: float,
                          final_resample_rate: float,
                          filters: str = "rat", hg_only: bool = True,
                          mean_frac: float = 0.95, scaling: float = SCALING,
                          precision: str = "single",
                          seg_len: int | None = None,
                          seg_overlap: int = 4096) -> PreprocessResult:
    """The bounded-memory pipeline: every spectral stage is an
    overlap-segmented kernel on the LONG layout, so per-task memory is
    O(seg_len), independent of recording length.

    Physical plan — 3 segment shuffles + 1 CAR window shuffle:
      [scale, narrow] ->
      seg A: fused resample(initial)+notch, one bounded group per
             (series, channel, segment) ->
      CAR: window over (series_id, sample_idx) — per-timepoint across
           channels, group size = n_channels, inherently bounded; no
           packed row ever holds a whole channel ->
      seg B: fused wavelet|.| + resample(final), band fan-out.

    vs the default packed plan (2 shuffles) this pays ~2 extra shuffles
    and segment-overlap recompute — the price of never materializing a
    whole channel. Use it when n_time * n_bands * 8 B approaches the
    executor task budget (SCALE.md "Memory bound")."""
    import numpy as np

    from .dsp.filterbank import band_params
    from .operators.segmented import (resample_exact, segmented_band_kernel,
                                      segmented_kernel, snap_overlap)

    base = int(seg_len) if seg_len is not None else 2 ** 16
    # overlap is a numerics knob (boundary-error tolerance); cap it at a
    # quarter segment so a small explicit seg_len composes with the
    # default overlap instead of tripping the overlap<seg_len validation.
    # Safe against snap_overlap's snap-UP because _snap_seg_len guarantees
    # seg_len >= 2 denominators: snapped overlap <= L/4 + d - 1 < L.
    def _ov(L: int, new: float, old: float) -> int:
        v = snap_overlap(min(int(seg_overlap), max(1, L // 4)), new, old)
        assert v < L, (v, L)   # guaranteed by the 2*d floor in _snap_seg_len
        return v

    from fractions import Fraction as _Fr

    # exact rate ratios (floats are binary rationals, so these are the
    # kernels' own grids) — the float quotient's best rational could in
    # principle differ and desync trim offsets from kernel output lengths
    fr1 = _Fr(initial_resample_rate) / _Fr(rate)
    fr2 = _Fr(final_resample_rate) / _Fr(initial_resample_rate)
    seg_a = _snap_seg_len(base, initial_resample_rate, rate)
    ov_a = _ov(seg_a, initial_resample_rate, rate)

    # resample_exact, not the parity kernel: inside a segment the parity
    # kernel's pad-rounding would drift the local grid (resample_exact doc)
    def stage_a(x: np.ndarray) -> np.ndarray:
        y = resample_exact(x, initial_resample_rate, rate,
                           precision=precision)
        return K.apply_linenoise_notch(y, initial_resample_rate,
                                       precision=precision)

    scaled = signals.withColumn("value", F.col("value") * float(scaling))
    ds = segmented_kernel(scaled, stage_a, seg_a, ov_a, ratio=fr1)

    # CAR on long rows: the window groups by timepoint (n_channels values
    # per group) — already memory-bounded, no segmentation needed, and
    # per-timepoint semantics make it exact (no boundary error here).
    car_ln = subtract_car(ds, mean_frac=mean_frac)

    seg_b = _snap_seg_len(base, final_resample_rate, initial_resample_rate)
    ov_b = _ov(seg_b, final_resample_rate, initial_resample_rate)

    # The wavelet kernels' unit-L2 normalization depends on the FFT grid
    # length, so a segment-local transform would come out ~sqrt(n/segment)
    # off the whole-channel amplitude convention (K.dense_kernel_norms).
    # Pin each series to its dense-grid constants: one column-pruned
    # metadata aggregate (the per-series length a real catalog would
    # already know) broadcast-JOINED onto the long rows as `_n_time` —
    # it rides the segment shuffle as a column, so the kernel closure
    # stays O(1) and nothing is collected to the driver even at millions
    # of series. Each worker derives the norms from its group's length
    # (O(n_padded) math, memoized per distinct length per worker).
    lens = signals.groupBy("series_id").agg(
        (F.max("sample_idx") + 1).cast("bigint").alias("_n_time"))

    _norm_cache: dict[int, "np.ndarray"] = {}

    def stage_b(x: np.ndarray, meta: dict) -> np.ndarray:
        n_time = int(meta["_n_time"])
        norms = _norm_cache.get(n_time)
        if norms is None:
            if len(_norm_cache) >= 16:   # distinct lengths per worker
                _norm_cache.clear()
            norms = _norm_cache.setdefault(n_time, K.dense_kernel_norms(
                -(-n_time * fr1.numerator // fr1.denominator),  # ceil(n*r1)
                initial_resample_rate, filters=filters, hg_only=hg_only))
        Xh, _, _, _ = K.wavelet_transform(x[:, None], initial_resample_rate,
                                          filters=filters, hg_only=hg_only,
                                          precision=precision,
                                          kernel_norms=norms)
        return resample_exact(np.abs(Xh[:, 0, :]), final_resample_rate,
                              initial_resample_rate, precision=precision)

    bands = segmented_band_kernel(
        car_ln.join(F.broadcast(lens), "series_id"), stage_b, seg_b, ov_b,
        ratio=fr2, meta_cols=("_n_time",))

    cfs, sds = band_params(filters, hg_only)
    cf_arr = F.array(*[F.lit(float(c)) for c in cfs])
    sd_arr = F.array(*[F.lit(float(s)) for s in sds])
    tf = bands.select(
        "series_id", "channel", "band",
        F.element_at(cf_arr, F.col("band") + 1).alias("cf"),
        F.element_at(sd_arr, F.col("band") + 1).alias("sd"),
        "sample_idx", "amp")
    return PreprocessResult(
        tf=tf, stages={"CAR_ln_downsampled": car_ln, "wvlt_amp": tf})


def preprocess_many(signal_dfs: dict[str, DataFrame], rate: float,
                    **kwargs) -> PreprocessResult:
    """The `preprocess_folder` analog (scripts/preprocess_folder:38-54):
    instead of a driver loop over .nwb files, union all series into ONE
    job — series_id is just another group key, so every stage (pack,
    kernels, packed CAR, wavelet) parallelizes across series x channels
    with no outer loop. `signal_dfs` maps series ids to long DataFrames;
    the dict KEY becomes the series_id (any existing series_id column is
    overwritten — pass each recording under its own key; a df that
    already multiplexes several recordings must be passed as-is to
    `preprocess` directly, not through this dict, or its series would be
    collapsed into one)."""
    if not signal_dfs:
        raise ValueError("preprocess_many: empty signal_dfs")
    parts = []
    for sid, df in signal_dfs.items():
        parts.append(df.withColumn("series_id", F.lit(sid)))
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return preprocess(merged, rate, **kwargs)


def high_gamma_trace(result: PreprocessResult, baseline_seconds: float = 0.25,
                     final_rate: float = 400.0) -> DataFrame:
    """Tutorial tail: z-score against the first `baseline_seconds`, then
    mean over bands (examples/plot_ECoG_preprocessing_tutorial.py:164-167).

    Runs on the packed wavelet rows when the result carries them (array
    folds + one small band zip — see operators/zscore.high_gamma_packed);
    falls back to the long window/groupBy formulation otherwise."""
    n_baseline = int(baseline_seconds * final_rate)
    if result.tf_packed is not None:
        return high_gamma_packed(result.tf_packed, n_baseline,
                                 values_col="amp")
    z = zscore_baseline(result.tf, n_baseline, value_col="amp")
    return band_mean(z, value_col="amp")
