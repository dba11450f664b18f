"""Frozen, hashable configuration objects for every pipeline.

The reference configures each script through ~90 module-level UPPERCASE
constants mutated by kwargs and cross-module monkeypatching
(``shape_ftp.py:13-224``, ``shape_ftp.py:1440-1462``,
``multimodal_sensor.py:492-503``).  Here each pipeline gets one frozen
dataclass whose instances are hashable, so they can be passed to ``jax.jit``
as static arguments; all defaults reproduce the reference values.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple


Point = Tuple[int, int]


@dataclass(frozen=True)
class FTPConfig:
    """Fourier-transform-profilometry core configuration.

    Defaults mirror ``shape_ftp.py:13-224``.
    """

    # --- ROI: outer circle from 3 fixed points (shape_ftp.py:41-43) ---
    outer_circle_p1: Point = (1873, 1703)
    outer_circle_p2: Point = (1599, 707)
    outer_circle_p3: Point = (2575, 950)
    roi_erode_px: int = 0

    # --- Sideband isolation (shape_ftp.py:24-32) ---
    sideband_method: str = "patch_shift"  # or "gauss"
    patch_half_width_bins: int = 10
    patch_window: str = "hann"
    band_radius: float = 8.0
    gauss_trunc_radius: float = 24.0
    dc_exclusion: int = 10
    n_fft_peaks: int = 12
    # carrier-peak search: 'topk' = reference-faithful top-k + filter
    # cascade (shape_ftp.py:444-463); 'cascade' = the same cascade as fused
    # masked argmaxes (ops/fftops.py::carrier_peak_cascade) — lax.top_k
    # sorts the whole spectrum (~5 ms at the 4K crop)
    peak_method: str = "topk"
    # minimum padded-FFT extent for the rfft2 demod-pair fast path
    # (ftp/demod.py::_demod_pair_rfft).  The half-spectrum transform wins
    # at the 4K crop (-1.5 ms) but its Hermitian-mirror patch assembly
    # costs more than the saved FFT work on small grids; 0 engages it
    # whenever the preconditions (right-half-plane cascade + patch_shift)
    # hold.
    demod_rfft_min_px: int = 0

    # --- Preprocess (shape_ftp.py:34-38, 110-124) ---
    fft_pad_px: int = 96
    pre_blur_sigma_px: float = 1.5
    illum_sigma_px: float = 45.0
    remove_mean_after_apod: bool = True
    use_circular_apodization: bool = True
    apod_taper_px: int = 120
    use_hann_window: bool = False

    bad_pixel_enable: bool = True
    bad_intensity_percentile: float = 99.9
    bad_gradient_percentile: float = 99.7
    bad_dilate_ksize: int = 5
    bad_dilate_iters: int = 1
    bad_inpaint_radius: int = 3

    # --- Reliability mask (shape_ftp.py:90-97, 113-115) ---
    amp_valid_percentile: float = 25.0
    quality_smooth_sigma_px: float = 6.0
    reliable_keep_largest_cc: bool = True
    reliable_edge_margin_px: int = 6
    valid_morph_close: bool = True
    valid_close_kernel: int = 7
    valid_close_iters: int = 1

    # --- Detrend (shape_ftp.py:95, 127-134) ---
    poly_order: int = 2
    use_two_pass_detrend: bool = True
    contact_core_percentile: float = 8.0
    contact_percentile: float = 92.0
    dilate_kernel_size: int = 15
    dilate_iters: int = 2
    min_contact_frac: float = 0.002
    max_contact_frac: float = 0.40
    remove_global_plane_before_detrend: bool = True
    plane_order_for_removal: int = 1

    # --- Heightmap assembly (shape_ftp.py:96, 137-153) ---
    reliable_smooth_sigma_px: float = 2.5
    unreliable_base_value: float = 0.0
    fill_internal_holes_in_reliable: bool = True
    hole_neighborhood_px: int = 11
    hole_known_fraction: float = 0.70
    hole_min_dist_from_reliable_edge_px: int = 4
    inpaint_radius: int = 5
    smooth_unreliable_region: bool = True
    unreliable_smooth_sigma_px: float = 9.0
    allow_positive_deformation: bool = False
    auto_flip_sign: bool = True

    # --- Frontier taper (shape_ftp.py:102-104) ---
    frontier_zero_enable: bool = True
    frontier_zero_band_px: int = 200
    frontier_zero_curve: str = "smoothstep"

    # --- Output units (shape_ftp.py:49-53) ---
    output_height_in_mm: bool = True
    mm_keep_indentation_negative: bool = False

    # --- Contact blob filter (shape_ftp.py:59-71) ---
    filter_small_contact_blobs: bool = True
    contact_blob_min_peak_mm: float = 0.1
    contact_blob_min_peak_rel_frac: float = 1.0 / 3.0
    contact_blob_min_area_px: int = 0
    # candidate-mask depth floor for blob labeling.  The reference uses a
    # strict depth > 0 (shape_ftp.py:1234), which makes blob TOPOLOGY (and
    # so the keep/drop of near-threshold lobes) depend on float-dust-level
    # sign flips of ~um-deep bridge pixels.  Defaulting to the system's own
    # contact threshold (ForceConfig.depth_eps_mm = 0.01) is principled —
    # pixels that cannot contribute contact volume do not define blob
    # connectivity — and pins the topology across numeric presets.
    # Set 0.0 for the literal reference rule.  Measured on TPU at 4K (r3):
    # eps=0 reproduces the razor-bridge sensitivity and lands FINAL_F at
    # +9.26% force vs the committed golden; eps=1e-2 lands at -0.02% —
    # matching the reference's OWN committed outputs requires the pinned
    # topology, which is why the deviation is the default here (regression
    # pins: tests/test_ops_components.py::
    # test_blob_candidate_eps_pins_razor_bridge_topology and
    # tests/test_golden_force.py::
    # test_final_f_eps0_reference_literal_razor_bridge).
    contact_blob_cand_eps_mm: float = 1e-2

    # --- Alignment (shape_ftp.py:174-197) ---
    apply_global_shift: bool = True
    use_ecc_crop_alignment: bool = True
    ecc_warp_mode: str = "euclidean"
    ecc_iters: int = 300
    ecc_eps: float = 1e-7
    ecc_gauss_filt: float = 5.0
    # GN statistics grid stride (TPU knob; 1 = reference-faithful)
    ecc_stride: int = 1
    # per-iteration warp sampler: 'gather' (reference-faithful bilinear) or
    # 'shear' (gather-free two-pass shear, ~9x faster; valid for residual
    # warps within +-(ecc_shear_k-1) px after global-shift removal)
    ecc_sampler: str = "gather"
    ecc_shear_k: int = 4
    # divergence early-out: stop the GN loop after this many iterations
    # without a rho improvement (0 = disabled, cv2-faithful).  Measured on
    # TPU at 4K (r3): the known ECC-failure scene (ROUND_METAL) already
    # exits via the StsNoConv fast path, so patience=25 moves neither
    # latency nor force on any demo scene (parity 1712 vs 1713 ms, deploy
    # 152.5 vs 152.8 ms, forces identical) — it is a worst-case latency
    # bound for the true oscillating regime, enabled in deploy.
    ecc_stall_patience: int = 0
    # fuse the ENTIRE GN solver (while_loop + 3x3 solve) into one Pallas
    # launch (pallas/ecc_loop_kernel.py); only active for the euclidean/
    # shear configuration on TPU.  Deploy default (measured on v5e,
    # KNOBS_r03.json: neutral alone, -0.05 ms in the all-3 combination).
    ecc_loop_kernel: bool = False
    # estimate the ECC warp on a dxd-average-pooled crop (alignment is
    # low-frequency — the inputs are sigma-5 blurred) and scale the
    # translations back; engages only on crops >= ecc_downsample_min_px.
    # 1 = reference-faithful full-resolution estimation.
    ecc_downsample: int = 1
    ecc_downsample_min_px: int = 1024
    # coarse-to-fine ECC: solve first on an ecc_coarse_downsample-pooled
    # crop (cheap GN iterations), then seed the ecc_downsample-grid solve
    # with the scaled coarse warp and run at most ecc_polish_iters
    # refinement iterations there.  The final basin is solved on the SAME
    # grid as the plain ecc_downsample solve, so accuracy tracks that
    # preset (the pure ds=4 solve was measured outside the 1% contract on
    # FINAL_E, KNOBS_4K_r04.json; the hybrid keeps ds=4 only for the
    # initial descent).  0 = off.  Engages with the same min_px gate as
    # ecc_downsample.
    ecc_coarse_downsample: int = 4
    ecc_polish_iters: int = 0
    global_shift_blur_sigma: float = 7.0
    # bound for the dynamic-slice translation warp (px)
    global_shift_max_px: int = 96
    # estimate the global shift on a dxd-average-pooled frame and scale the
    # shift back; engages only on frames whose short side is >=
    # global_shift_downsample_min_px.  1 = reference-faithful full-frame
    # phase correlation.  NOT a deploy default: the sigma-7 pre-blur leaves
    # so little coherent spectrum that the pooled P/|P| normalization is
    # roundoff-fragile on real frames — measured on the FINAL_F golden it
    # alone moved force +77% (docs/PERF.md).  On synthetic frames with
    # adequate low-frequency texture it is sub-pixel-faithful
    # (tests/test_ops_registration.py).
    global_shift_downsample: int = 1
    global_shift_downsample_min_px: int = 1024
    # cross-power normalization regularizer for the POOLED phase
    # correlation: P/(|P| + eps*max|P|) instead of cv2's P/|P| whitening.
    # The round-3 incident (FINAL_F +77%) was the whitening amplifying
    # blur-zeroed bins to unit magnitude on the 2x2-pooled spectrum; the
    # regularized form damps exactly those bins.  Applied only on the
    # pooled path (the full-frame path stays cv2-faithful).
    global_shift_pc_eps: float = 0.0
    # full-RESOLUTION phase-correlation window (square, px), centered on
    # the ROI bbox: unlike the rejected pooled knob above, this narrows the
    # field of view instead of decimating the spectrum, so every retained
    # frequency keeps its full-resolution phase and the sigma-7 P/|P|
    # roundoff pathology does not arise.  The global shift is a rigid
    # camera translation, so any sufficiently textured window sees it; the
    # ROI (printed grating) is the most textured region of the frame.
    # 0 = reference-faithful full-frame correlation.  Engages only when
    # the frame exceeds window + 2*margin in both dimensions.
    global_shift_window_px: int = 0

    # --- Grating-band prealignment (shape_ftp.py:184-197, 1542-1616) ---
    # second ECC pass on highpassed gratings over the band between the
    # pass-1 reliable mask and the ROI (USE_GRATING_PREALIGNMENT; off by
    # default in the reference too)
    use_grating_band_prealign: bool = False
    grating_prealign_band_px: int = 200
    grating_prealign_dilate_reliable_px: int = 0
    grating_prealign_hp_sigma_px: float = 35.0
    grating_prealign_ecc_mode: str = "euclidean"
    grating_prealign_ecc_iters: int = 250
    grating_prealign_ecc_eps: float = 1e-7
    grating_prealign_ecc_gauss_filt: float = 0.0

    # --- Carrier handling (shape_ftp.py:200-218) ---
    force_right_half_plane: bool = True
    prefer_peak_near_center_row: bool = True
    peak_max_dy_from_center: float = 0.12
    carrier_local_search_radius: int = 6
    lock_carrier_to_reference: bool = True
    apply_dk_ramp_correction: bool = True

    # --- Unwrap solver (TPU substitution for shape_ftp.py:1043-1080) ---
    unwrap_cg_iters: int = 30
    unwrap_cg_tol: float = 1e-8
    # whole-fit IRLS polyfit megakernel (pallas/polyfit_kernel.py) for the
    # detrend chain; deploy default (measured on v5e, KNOBS_r03.json:
    # 1.300 -> 1.206 ms at bench scale)
    polyfit_kernel: bool = False
    # 'wls' = XLA PCG loop; 'wls_pallas' = the whole solve in one fused
    # VMEM kernel (pallas/unwrap_kernel.py) — the PCG while_loop is the
    # last launch-bound chain in the deploy force path.  Falls back to
    # 'wls' off-TPU and above the VMEM residency budget.
    unwrap_method: str = "wls"
    # solve the WLS system on a dxd-pooled grid and bilinearly upsample the
    # SMOOTH solution before the full-res congruence projection (d^2 less
    # PCG work; the projection snaps to wrapped + 2pi*k exactly, so only
    # isolated k-flips can differ — the same dust the projection already
    # produces).  Engages only on crops >= unwrap_downsample_min_px;
    # 1 = solve at full resolution.
    unwrap_downsample: int = 1
    unwrap_downsample_min_px: int = 1024

    # --- TPU numerics knobs (no reference equivalent) ---
    # 'sort' = exact NumPy-faithful percentiles; 'hist' = histogram
    # refinement (faster on TPU, error << any pipeline threshold noise)
    percentile_method: str = "sort"
    # IRLS rounds that re-estimate the robust scale (median/MAD); rounds
    # beyond reuse the last sigma (6 = reference-faithful)
    polyfit_resigma_iters: int = 6
    # total IRLS rounds per polyfit (6 = reference-faithful)
    polyfit_iters: int = 6
    # fold the order-1 global plane removal into the order-2 detrend fit
    # (the quadratic basis contains the plane; skips one whole IRLS polyfit)
    detrend_fold_plane: bool = False
    # statistic for post-apodization DC removal: 'median'
    # (reference-faithful, shape_ftp.py:846-848) or 'mean' (one reduction;
    # the apodized normalized image is near-symmetric about 0)
    dc_remove_stat: str = "median"
    # separable-conv association order: False = banded MXU matmuls (the
    # parity-contract order: the committed 4K goldens sit within +-0.5%
    # with it; the VPU shift-add order moved FINAL_TEMP_DEMO +0.40% ->
    # +1.42%), True = VPU shift-adds for kernels <= 63 taps (memory-bound
    # instead of MXU-bound; the win is on full-frame blurs, i.e. the
    # temperature path — the force path's blurs run on the ~1747^2 crop
    # where the banded matmul is already cheap).  See
    # ops/filters.py::_SHIFT_ADD_MAX_TAPS.
    conv_vpu: bool = False
    inpaint_iters: int = 64
    # distance-transform metric: 'chamfer3' = cv2 DIST_L2 3x3 chamfer
    # (reference-faithful; every reference call site uses it), 'euclid' =
    # exact jump-flooding EDT (fewer sequential rounds on TPU)
    distance_metric: str = "chamfer3"
    # 'label' = exact largest-by-area CC; 'seed_edt' = component containing
    # the deepest interior point via geodesic reconstruction (deploy mode)
    largest_cc_method: str = "label"
    # seed_edt's EDT runs on a cc_seed_pool-min-pooled mask (16x less
    # jump-flooding work at 4): the deepest interior point of the pooled
    # mask maps to a pixel >= pool-width inside the same full-res blob, and
    # the full-res geodesic reconstruction from it is unchanged.  Only the
    # SEED selection coarsens; masks whose deepest pooled blob differs from
    # the deepest full-res blob could pick a different component (gated by
    # the goldens + corpus like every seed_edt deviation).  1 = full-res.
    cc_seed_pool: int = 1

    # --- Image geometry (static shapes; reference is 3840x2160) ---
    image_height: int = 2160
    image_width: int = 3840

    def replace(self, **kw) -> "FTPConfig":
        return dataclasses.replace(self, **kw)

    def deploy(self) -> "FTPConfig":
        """Latency-oriented TPU preset: fused-Pallas bisection percentiles,
        strided ECC statistics, gather-free shear ECC sampling (with the
        fused GN-iteration kernel, ``pallas/ecc_kernel.py``), EDT-seeded
        dominant-component selection, reduced solver budgets.  Validated on
        the 5 demo scenes: deploy force lands within 1% of the committed
        reference outputs at native 4K (r3 artifact max 0.75%,
        GOLDENS_r03_deploy.json; the margin above the parity preset's 0.5%
        is the preset's intrinsic f32-reordering sensitivity — any conv
        re-association moves a scene O(0.3pp)) and within 0.1% of the
        parity preset at bench scale.

        ``hist_pallas`` fuses each masked-quantile refinement into one
        VMEM-resident bisection kernel; together with the fused inpaint and
        ECC kernels the measured 640x480 frame->force p50 is 1.51 ms
        (664 fps/chip, BENCH_r03) vs 3.83 ms in round 2.  The three staged
        whole-solver megakernels are deploy defaults as of round 3's
        on-chip measurement (KNOBS_r03.json: deploy-base 1.300 ms; +polyfit
        1.206; +unwrap 1.173; all three 1.034 ms / 967 fps —
        ``unwrap_method='wls_pallas'``, ``ecc_loop_kernel``,
        ``polyfit_kernel``).  Crops too large for VMEM (native-4K) fall
        back to equal-accuracy XLA paths automatically, so the preset is
        size-safe.

        The shear sampler's reach must cover the largest rotational
        displacement across the crop (~theta_max * crop_radius); scale it
        with the configured frame height (12 px at the native 2160-row
        frames, bench-validated 4 px at 480 rows)."""
        shear_k = max(4, round(12 * self.image_height / 2160))
        return self.replace(percentile_method="hist_pallas", ecc_stride=2,
                            largest_cc_method="seed_edt", ecc_sampler="shear",
                            ecc_shear_k=shear_k, ecc_stall_patience=25,
                            polyfit_resigma_iters=2, unwrap_cg_iters=16,
                            polyfit_iters=4, detrend_fold_plane=True,
                            dc_remove_stat="mean",
                            fill_internal_holes_in_reliable=False,
                            unwrap_method="wls_pallas",
                            ecc_loop_kernel=True,
                            polyfit_kernel=True,
                            # native-4K only (the min_px gate keeps bench
                            # scale untouched): ECC GN on a 2x2-pooled crop
                            # is 40.8 -> 11.0 ms (profile_align4k.py); the
                            # sigma-5 pre-blur makes the warp estimate
                            # pooling-invariant, goldens-verified (FINAL_F
                            # +0.78% vs +0.75% at full res).
                            # global_shift_downsample stays OFF: measured
                            # on FINAL_F it alone moved force +77% — the
                            # sigma-7 blur leaves so little coherent
                            # spectrum that the pooled P/|P| phase
                            # correlation is roundoff-fragile on real
                            # frames (see docs/PERF.md).
                            ecc_downsample=2,
                            # coarse-to-fine: ds=4 descent + <=10 GN
                            # polish iterations on the ds=2 grid (the same
                            # grid the plain deploy solve used; measured
                            # bit-same forces on the bisected golden, r5)
                            ecc_polish_iters=10,
                            # global_shift_window_px stays OFF: the
                            # full-resolution 2048^2 ROI window is 10.7 ->
                            # 1.8 ms but its shift estimate differs from
                            # the full-frame one by ~0.3 px (different
                            # content), which moved the lightest-contact
                            # golden +0.38% -> +1.16% force — outside the
                            # 1% contract (scripts/bisect_r05_knobs.py).
                            # A grating-centered window also risks the
                            # period-ambiguity failure mode on periodic
                            # content.  The deploy PC win is instead the
                            # estimate-preserving internal rewrite in
                            # ops/registration.py::phase_correlate.
                            # pooled-EDT seed for the dominant-component
                            # selection (4.5 -> 1.4 ms at the 4K crop;
                            # bit-same force on the bisected golden)
                            cc_seed_pool=4,
                            # glare-hole diffusion budget: the XLA
                            # relaxation loop is HBM-bound at 4.3 ms/pair
                            # x64 iters and the dilated glare specks are
                            # <=10 px wide, so 20 iterations over-cover
                            # the fill radius; bisected TEMP_DEMO +0.50%,
                            # F +0.75%, E +0.73% — in contract (r5)
                            inpaint_iters=20,
                            # coarse-grid WLS unwrap + full-res congruence
                            # projection (also min_px-gated to native 4K):
                            # the projection snaps to wrapped + 2*pi*k, so
                            # the force outputs are identical to the
                            # full-res deploy solve on the goldens while
                            # the PCG cost drops 16x (4K deploy p50
                            # 118 -> 86.7 ms, GOLDENS_r03_deploy.json).
                            unwrap_downsample=4,
                            # carrier search as fused masked argmaxes
                            # instead of a full-spectrum lax.top_k sort
                            # (identical pick on all goldens; semantics
                            # note at fftops.carrier_peak_cascade)
                            peak_method="cascade")


@dataclass(frozen=True)
class ForceConfig:
    """Force-sensor configuration (``force_sensor.py:33-44``,
    ``height_to_force.py:57-63``)."""

    grating_pitch_mm: float = 2.0
    depth_eps_mm: float = 0.01
    override_mm_per_px: Optional[float] = None


@dataclass(frozen=True)
class TempConfig:
    """Temperature-sensor configuration (``temperature_sensor.py:32-98``)."""

    outer_circle_p1: Point = (1845, 1818)
    outer_circle_p2: Point = (1517, 623)
    outer_circle_p3: Point = (2687, 914)
    use_inner_circle: bool = False
    inner_circle_p1: Point = (1881, 1749)
    inner_circle_p2: Point = (1579, 665)
    inner_circle_p3: Point = (2616, 936)

    crop_output_to_outer_roi: bool = True
    crop_pad_px: int = 10

    blur_ksize: int = 5

    color_t_min: float = 20.0
    color_t_max: float = 33.0
    color_guard_band: float = 0.5
    switch_margin_c: float = 1.0
    final_t_min: float = 20.0
    final_t_max: float = 75.0

    seg_band_radius: float = 22.0
    seg_dc_exclusion: int = 28
    seg_force_right_half_plane: bool = True
    seg_prefer_peak_near_center_row: bool = True
    seg_peak_max_dy_from_center: float = 0.14
    seg_illum_sigma: float = 20.0
    seg_n_peaks: int = 16
    # carrier-peak search: 'topk' = reference-faithful top-k + filter
    # cascade; 'cascade' = the same filter cascade as three fused masked
    # argmaxes (ops/fftops.py::carrier_peak_cascade; ~0.2 ms vs ~14 ms at
    # native 4K — lax.top_k sorts)
    seg_peak_method: str = "topk"
    # bandpassed inverse transform: 'fft' = full-frame masked ifft2;
    # 'matmul' = exact two-matmul windowed IDFT around the carrier
    # (ops/fftops.py::ifft2_bandpass_dynamic; ~0.7 ms vs ~7 ms at 4K,
    # f32-rounding-level differences only)
    seg_bandpass: str = "fft"
    # forward transform: 'fft2' = full complex spectrum; 'rfft2' = real-input
    # half spectrum (half the FFT work, no full-plane fftshift).  Takes
    # effect only when the preconditions hold (cascade peak search, right
    # half-plane forced, matmul bandpass, even dims) — otherwise the full
    # fft2 runs regardless.  rfft-vs-fft rounding dust only (the demod rfft
    # path's argument, ftp/demod.py)
    seg_fft: str = "fft2"

    sat_thresh_gray: int = 245
    sat_dilate_ksize: int = 13

    post_close_kx: int = 3
    post_close_ky: int = 31
    post_open_kx: int = 3
    post_open_ky: int = 7

    color_chroma_min: float = 10.0
    color_support_dilate: int = 3

    final_smooth_enable: bool = True
    final_smooth_sigma_across: float = 6.0
    final_smooth_sigma_along: float = 1.0

    # TPU knob: evaluate LAB + chroma + both Huber-poly models + isotonic in
    # one fused Pallas VMEM pass (vistaf_tpu.pallas.temp_kernel)
    use_fused_kernel: bool = False
    # 'sort' (exact) or 'hist' percentiles for segmentation statistics
    percentile_method: str = "sort"
    # separable-conv association order (see FTPConfig.conv_vpu): False =
    # banded MXU matmuls, True = VPU shift-adds for kernels <= 63 taps —
    # the deploy default here, where the full-frame per-channel feature
    # blurs are the measured win (~10 ms/channel at 4K)
    conv_vpu: bool = False
    # diffusion-inpaint iteration budgets (wide / color domains)
    wide_inpaint_iters: int = 96
    color_inpaint_iters: int = 48
    # oriented-blur rotation operator: 'gather' = full-frame bilinear
    # gathers (closest to cv2.warpAffine; parity default), 'shear' = Paeth
    # three-shear rotation via vectorized shift-selects (ops/warp.py::
    # rotate_stack_shear) — the gathers alone were ~577 of ~690 ms of the
    # native-4K temperature latency (scripts/profile_temp4k.py)
    rotate_method: str = "gather"
    # run every per-pixel stage after segmentation (feature blur, models,
    # inpaint, fusion, oriented blur, stats) on the static outer-ROI bbox
    # instead of the full frame (~2.7x less area at native 4K), re-embedding
    # the maps afterwards; numerics change only within the blur reach of
    # the bbox border, which the ROI never sees (pad 64 px)
    crop_compute: bool = False

    def deploy(self) -> "TempConfig":
        """Latency-oriented TPU preset.  ``conv_vpu`` routes the per-channel
        feature blurs and the oriented smoothing to VPU shift-adds (~10 ms
        per channel saved at native 4K vs banded MXU matmuls,
        profile_temp4k.py).  Measured against the committed goldens on the
        real chip (GOLDENS_r03_deploy.json): scene temperature means within
        0.073 degC of the reference (0.1 degC contract), the single
        hottest pixel within 0.54 degC (0.75 degC deploy gate)."""
        # inpaint budgets: the widest wide-domain holes are the
        # sat_dilate_ksize=13 saturation specks (~7 px fill radius), so 16
        # iterations is ~2.3x the fill radius — the same margin as the
        # force path's inpaint_iters=20 cut.  Measured on all 5 golden
        # scenes (scripts/bisect_temp_r05.py): scene stats BIT-SAME from
        # 48/24 down through 16/8, p50 21.0 -> 16.6 ms.
        return self.replace(percentile_method="hist_pallas", use_fused_kernel=True,
                            wide_inpaint_iters=16, color_inpaint_iters=8,
                            rotate_method="shear", crop_compute=True,
                            conv_vpu=True, seg_peak_method="cascade",
                            seg_bandpass="matmul", seg_fft="rfft2")

    wide_inpaint_radius: int = 7
    color_inpaint_radius: int = 5

    image_height: int = 2160
    image_width: int = 3840

    def replace(self, **kw) -> "TempConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class SessionConfig:
    """Multimodal session-runner configuration (``multimodal_sensor.py:34-49``)."""

    output_root: str = "./Multimodal_Sensor/run_output"
    save_summary_figures: bool = True
    export_heightmaps: bool = True
    show_3d_interactive: bool = False
    # trace both modality forwards into ONE XLA program (one def-frame
    # upload, one launch sequence) instead of two sequential jit calls;
    # same math — see MultimodalPipeline.step_fused
    fused_step: bool = False


# Reference calibration-artifact default locations (relative to a data root),
# matching the reference repo layout (SURVEY.md §2.2).
PHASE_TO_HEIGHT_JSON = "Force/Phase_to_height/calibration_out/calibration_model.json"
HEIGHT_TO_FORCE_JSON = "Force/Height_to_force/calibration_out/calibration_model.json"
TEMP_COLOR_METRICS_JSON = "Temperature/Colored_Model/calibration_out/models_final_summary_metrics.json"
TEMP_BLACK_METRICS_JSON = "Temperature/MixedColorBlack_Model/calibration_out/models_final_summary_metrics.json"
TEMP_COLOR_MODEL_GLOB = "Temperature/Colored_Model/calibration_out/color_model_global_huber_deg*.joblib"
TEMP_WIDE_MODEL_GLOB = "Temperature/MixedColorBlack_Model/calibration_out/black_model_global_huber_deg*.joblib"
