"""Single-image super-resolution inference — the working public API the
reference's ``main.py`` intended to be (it is broken: stub ``load_image`` and
a wrong-arity ``train_example`` call, ``src/main.py:7-28``, SURVEY.md §3.3).

Usage:
    sr = upscale(image)                      # HWC float/uint8 numpy → HWC float
    upscale_file("in.jpg", "out.png")        # file → file
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from srgan_tpu.config import ModelConfig
from srgan_tpu.models.enhancer import enhance
from srgan_tpu.models.srresnet import SRResNet, init_generator
from srgan_tpu.training.steps import infer_step
from srgan_tpu.utils.image_io import load_image, save_image


def to_float01(image: np.ndarray) -> np.ndarray:
    """Input-range normalization for inference entry points.

    uint8 input is ALWAYS /255 — branching on dtype, not values: a
    legitimately dark uint8 frame (every pixel ≤ 1) must not be mistaken
    for float [0, 1] data and SR'd at the wrong scale. Float inputs keep a
    value-range heuristic (max > 1.5 → 0-255-range floats from callers
    that converted without scaling)."""
    arr = np.asarray(image)
    if arr.dtype == np.uint8:
        return arr.astype(np.float32) / 255.0
    arr = arr.astype(np.float32)
    if arr.max() > 1.5:
        arr = arr / 255.0
    return arr


class Upscaler:
    """Holds a generator (params + apply) and runs jit'd SR inference.

    Pass ``mesh`` (a 1-D ``jax.sharding.Mesh``) to serve data-parallel:
    batches are sharded over the mesh's data axis, params replicated once,
    and XLA partitions the forward across chips — the serving-side analogue
    of the training mesh (srgan_tpu.parallel.mesh). Combined with
    :meth:`upscale_tiled` this scales one giant image across a pod slice:
    every chip SRs its share of the fixed-shape tile batch.
    """

    def __init__(
        self,
        model: SRResNet,
        params,
        *,
        enhance_output: bool = False,
        mesh=None,
        ensemble: bool = False,
        tta: bool = False,
    ):
        """``ensemble=True``: ``params`` carries a leading pool axis and
        every forward returns the member-MEAN SR (``infer_step_ensemble``).
        The multi-generator pool trains N members but the reference serves
        only member 0 (``src/evaluation.py:22-31``); ensembling puts the
        rest to work at inference time.

        ``tta=True``: geometric self-ensemble (x8 dihedral TTA,
        ``infer_step_tta``) — composes with ``ensemble`` (8N forwards in
        one executable)."""
        self.model = model
        self.params = params
        self.enhance_output = enhance_output
        self.mesh = mesh
        self.ensemble = ensemble
        self.tta = tta
        self._replicated_params = None

    @classmethod
    def random_init(cls, cfg: Optional[ModelConfig] = None, seed: int = 0, **kw):
        import jax

        cfg = cfg or ModelConfig()
        model, params = init_generator(cfg, jax.random.key(seed))
        return cls(model, params, **kw)

    @classmethod
    def from_checkpoint(
        cls,
        results_dir: str,
        prefix: str = "Training",
        model_cfg: Optional[ModelConfig] = None,
        ensemble: bool = False,
        ema: bool = False,
        **kw,
    ):
        """Load the lead generator from an Orbax training checkpoint (the
        analogue of eval's ``Training_generator_model_0.pth`` load with DDP
        prefix stripping, ``src/evaluation.py:22-31``). The architecture is
        read from the checkpoint's JSON sidecar unless given explicitly.

        ``ensemble=True`` loads EVERY pool member and serves the
        member-mean SR (one fused executable; a single-member checkpoint
        degrades to the plain forward). ``ema=True`` serves the
        Polyak-averaged shadows saved by ``--ema-decay`` runs instead of
        the raw training params."""
        import jax.numpy as jnp

        from srgan_tpu.training import checkpoint as ckpt

        model_cfg = model_cfg or ckpt.load_model_config(results_dir, prefix)
        if model_cfg is None:
            raise FileNotFoundError(
                f"no {prefix}_model.json sidecar in {results_dir}; pass "
                "model_cfg explicitly for checkpoints from other sources"
            )
        model = SRResNet.from_config(model_cfg)
        if ensemble:
            members = ckpt.restore_all_generator_params(
                results_dir, prefix, ema=ema
            )
            if len(members) == 1:
                return cls(model, members[0], **kw)
            import jax

            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *members)
            return cls(model, stacked, ensemble=True, **kw)
        params = ckpt.restore_generator_params(results_dir, prefix, ema=ema)
        return cls(model, params, **kw)

    @classmethod
    def from_torch_checkpoint(cls, path: str, **kw):
        """Load a reference PyTorch ``.pth`` generator directly (migration
        path for existing users): conv weights transposed, BatchNorm folded,
        DDP prefix stripped — see ``srgan_tpu.utils.torch_port``."""
        from srgan_tpu.utils.torch_port import load_torch_checkpoint

        cfg, params = load_torch_checkpoint(path)
        return cls(SRResNet.from_config(cfg), params, **kw)

    def upscale(self, image: np.ndarray) -> np.ndarray:
        """HWC (or NHWC) image in [0, 1] (uint8 accepted) → upscaled HWC
        float32 in [0, 1]."""
        arr = to_float01(image)
        batched = arr[None] if arr.ndim == 3 else arr
        if self.mesh is not None:
            sr = self._upscale_sharded(batched)
        elif self.tta:
            from srgan_tpu.training.steps import infer_step_tta

            sr = infer_step_tta(
                self.model.apply, self.params, jnp.asarray(batched),
                ensemble=self.ensemble,
            )
        elif self.ensemble:
            from srgan_tpu.training.steps import infer_step_ensemble

            sr = infer_step_ensemble(
                self.model.apply, self.params, jnp.asarray(batched)
            )
        else:
            sr = infer_step(
                self.model.apply, self.params, jnp.asarray(batched)
            )
        if self.enhance_output:
            sr = enhance(sr)
        out = np.clip(np.asarray(sr), 0.0, 1.0)
        return out[0] if arr.ndim == 3 else out

    def upscale_u8(self, image: np.ndarray) -> np.ndarray:
        """Like :meth:`upscale` but returns uint8, quantized ON DEVICE
        (`steps.infer_step_u8`) — 4x less device→host traffic, the serving
        bottleneck on thin host links. Bit-identical to
        ``array_to_image(self.upscale(x))``'s uint8 output (the enhance
        epilogue runs inside the same executable)."""
        from srgan_tpu.training.steps import (
            infer_step_ensemble_u8,
            infer_step_u8,
        )

        arr = to_float01(image)
        batched = arr[None] if arr.ndim == 3 else arr
        if self.mesh is not None:
            out = np.asarray(self._upscale_sharded(batched, u8=True))
        elif self.tta:
            from srgan_tpu.training.steps import infer_step_tta_u8

            out = np.asarray(
                infer_step_tta_u8(
                    self.model.apply, self.params, jnp.asarray(batched),
                    enhance_out=self.enhance_output, ensemble=self.ensemble,
                )
            )
        else:
            step = infer_step_ensemble_u8 if self.ensemble else infer_step_u8
            out = np.asarray(
                step(
                    self.model.apply,
                    self.params,
                    jnp.asarray(batched),
                    enhance_out=self.enhance_output,
                )
            )
        return out[0] if arr.ndim == 3 else out

    def _upscale_sharded(self, batched: np.ndarray, u8: bool = False):
        """Data-parallel forward over ``self.mesh``: batch dim sharded,
        params replicated (cached after the first call). The batch is
        padded to a multiple of the mesh size so every chip gets an equal
        static-shape shard; padding rows are dropped on return."""
        from srgan_tpu.parallel.mesh import replicate, shard_batch
        from srgan_tpu.training.steps import (
            infer_step_ensemble,
            infer_step_ensemble_u8,
            infer_step_u8,
        )

        if self._replicated_params is None:
            self._replicated_params = replicate(self.mesh, self.params)
        n = batched.shape[0]
        n_dev = int(np.prod(list(self.mesh.shape.values())))
        pad = (-n) % n_dev
        if pad:
            batched = np.concatenate(
                [batched, np.repeat(batched[:1], pad, axis=0)]
            )
        x = shard_batch(self.mesh, jnp.asarray(batched))
        if self.tta:
            from srgan_tpu.training.steps import (
                infer_step_tta,
                infer_step_tta_u8,
            )

            if u8:
                sr = infer_step_tta_u8(
                    self.model.apply, self._replicated_params, x,
                    enhance_out=self.enhance_output, ensemble=self.ensemble,
                )
            else:
                sr = infer_step_tta(
                    self.model.apply, self._replicated_params, x,
                    ensemble=self.ensemble,
                )
        elif u8:
            step = infer_step_ensemble_u8 if self.ensemble else infer_step_u8
            sr = step(
                self.model.apply, self._replicated_params, x,
                enhance_out=self.enhance_output,
            )
        else:
            step = infer_step_ensemble if self.ensemble else infer_step
            sr = step(self.model.apply, self._replicated_params, x)
        return sr[:n]

    def upscale_file(self, in_path: str, out_path: str) -> None:
        save_image(self.upscale(load_image(in_path)), out_path)

    def upscale_tiled(
        self,
        image: np.ndarray,
        *,
        tile: int = 256,
        overlap: int = 16,
        batch_size: int = 16,
        fetch_u8: bool = False,
    ) -> np.ndarray:
        """Arbitrary-size SR with O(1) compiled executables and bounded HBM.

        The direct :meth:`upscale` path compiles one XLA executable per
        distinct input shape and materializes the whole activation pyramid —
        fine for a fixed camera size, wrong for ad-hoc photos (the workload
        of the reference's ``src/main.py``). Here the LR image is covered by
        fixed-``tile`` windows spaced ``tile - overlap`` apart (every tile
        the same static shape → exactly one compile, reused for every image
        ever after) and the SR tiles are feather-blended: the outer
        ``overlap // 2`` pixels of each tile get ~zero weight (convs have
        finite support, so pixels farther than the receptive field from
        every artificial tile edge are bit-identical to the whole-image
        result — weighting out the contaminated margin makes tiling *exact*,
        not approximate, once ``overlap >= 2 * receptive_field``), a
        half-cosine ramp covers the rest of the overlap, and the accumulated
        sum is normalized by total weight. At a true image border the tile
        sees the same padding the direct path would, so the ε floor there
        normalizes to 1 harmlessly.

        Exactness caveat: it holds for ``norm="none"`` models, whose compute
        graph is purely convolutional. GroupNorm normalizes over the whole
        spatial extent, so a GN model's tile statistics differ slightly from
        whole-image statistics and tiling becomes an approximation — for
        trained models the feature statistics are near-stationary and the
        deviation is visually negligible, but it is not bit-exact.

        Memory is bounded by ``batch_size`` tiles regardless of image size,
        so a wall-poster input that could never fit the direct path streams
        through in constant HBM.

        ``fetch_u8=True`` quantizes each SR tile ON DEVICE
        (``infer_step_u8``) and fetches uint8 — 4x less device→host traffic,
        the serving bottleneck on thin host links (CLAUDE.md: ~20 MB/s
        tunnel). Tiles are dequantized for the feather blend, so the result
        stays float; wherever tiling is exact (see above) neighboring tiles
        quantize identically and the blend of equal values reproduces them,
        so the final uint8 frame matches the direct ``upscale_u8`` path
        bit-for-bit there. Elsewhere the extra error is bounded by the
        quantization step (±1 LSB after re-quantization).
        """
        arr = to_float01(image)
        if arr.ndim != 3:
            raise ValueError("upscale_tiled expects a single HWC image")
        if overlap >= tile:
            raise ValueError("overlap must be smaller than tile")
        h, w, c = arr.shape
        s = self.model.upscale_factor

        # Reflect-pad up to at least one tile so tiny images still work.
        # numpy's reflect mode caps each pad at (dim - 1); images much
        # smaller than the tile pad iteratively (mirror-tiling the content).
        ph, pw = max(tile - h, 0), max(tile - w, 0)
        while ph or pw:
            dh = min(ph, arr.shape[0] - 1)
            dw = min(pw, arr.shape[1] - 1)
            if dh == 0 and dw == 0:  # degenerate 1-pixel extent: replicate
                arr = np.pad(arr, ((0, ph), (0, pw), (0, 0)), mode="edge")
                break
            arr = np.pad(arr, ((0, dh), (0, dw), (0, 0)), mode="reflect")
            ph -= dh
            pw -= dw
        hp, wp, _ = arr.shape

        stride = tile - overlap
        ys = list(range(0, max(hp - tile, 0) + 1, stride))
        xs = list(range(0, max(wp - tile, 0) + 1, stride))
        if ys[-1] + tile < hp:
            ys.append(hp - tile)
        if xs[-1] + tile < wp:
            xs.append(wp - tile)

        # Per-edge window profiles. An ARTIFICIAL tile edge (interior cut)
        # contaminates its `trim` margin, so that margin gets exactly zero
        # weight — a correct neighboring tile must fully own those pixels —
        # followed by a half-cosine ramp across the rest of the overlap. A
        # TRUE image border gets weight 1 all the way out: the tile sees the
        # same boundary the whole-image path would, so its values there are
        # already the direct path's values.
        trim = (overlap // 2) * s
        m = overlap * s - trim
        taper = np.ones(trim + m, np.float32)
        if m:
            ramp = 0.5 - 0.5 * np.cos(np.pi * (np.arange(m) + 0.5) / m)
            taper = np.concatenate([np.zeros(trim, np.float32), ramp])

        def profile(artificial_lo: bool, artificial_hi: bool) -> np.ndarray:
            p = np.ones(tile * s, np.float32)
            if trim + m:
                if artificial_lo:
                    p[: trim + m] = np.minimum(p[: trim + m], taper)
                if artificial_hi:
                    p[-(trim + m) :] = np.minimum(
                        p[-(trim + m) :], taper[::-1]
                    )
            return p

        acc = np.zeros((hp * s, wp * s, c), np.float32)
        wgt = np.zeros((hp * s, wp * s, 1), np.float32)
        coords = [(y, x) for y in ys for x in xs]
        for i in range(0, len(coords), batch_size):
            chunk = coords[i : i + batch_size]
            batch = np.stack(
                [arr[y : y + tile, x : x + tile] for y, x in chunk]
            )
            if len(chunk) < batch_size:
                # Pad partial chunks to the full batch shape so the tiled
                # path compiles exactly ONE executable regardless of image
                # size (a short chunk would otherwise trigger a new trace
                # per distinct tile count — O(#sizes) compiles again);
                # padding rows repeat tile 0 and are dropped below. Callers
                # tiling many small images should pick a small batch_size:
                # the padding waste is bounded by batch_size/1.
                batch = np.concatenate(
                    [batch, np.repeat(batch[:1],
                                      batch_size - len(chunk), axis=0)]
                )
            if fetch_u8:  # one executable either way: static tile shape
                sr = self.upscale_u8(batch).astype(np.float32) / 255.0
            else:
                sr = self.upscale(batch)
            for (y, x), out in zip(chunk, sr):
                win = np.outer(
                    profile(y > 0, y + tile < hp),
                    profile(x > 0, x + tile < wp),
                )[..., None]
                ys_, xs_ = y * s, x * s
                acc[ys_ : ys_ + tile * s, xs_ : xs_ + tile * s] += out * win
                wgt[ys_ : ys_ + tile * s, xs_ : xs_ + tile * s] += win
        out = acc / np.maximum(wgt, 1e-8)
        return np.clip(out[: h * s, : w * s], 0.0, 1.0)


def upscale(image: np.ndarray, upscaler: Optional[Upscaler] = None) -> np.ndarray:
    """Convenience wrapper: SR one image with a (randomly initialized, unless
    provided) flagship generator."""
    upscaler = upscaler or Upscaler.random_init()
    return upscaler.upscale(image)


def upscale_directory(
    input_dir: str,
    output_dir: str,
    *,
    results_dir: str = "results",
    prefix: str = "Training",
    enhance_output: bool = False,
    batch_size: int = 8,
    upscaler: Optional[Upscaler] = None,
    mesh=None,
    ensemble: bool = False,
    tta: bool = False,
    ema: bool = False,
    min_bucket_for_direct: int = 4,
    tile: int = 256,
    tile_batch: int = 4,
    tile_overlap: int = 16,
) -> int:
    """Batch-serving path: super-resolve every image in a folder.

    Streaming, O(batch) host memory: a first header-only pass buckets
    filenames by image size. Buckets with at least ``min_bucket_for_direct``
    files take the direct batched path (one compile per such size — images
    from one camera or dataset usually share a size, so typically one
    compile total), with the NEXT batch decoding on the native C++ thread
    pool (GIL released) while the current one runs on the TPU. Smaller
    buckets — the ad-hoc-photo folder of the reference's ``src/main.py``
    workload, where every file can be a distinct size — route through
    :meth:`Upscaler.upscale_tiled` instead, which serves EVERY size with one
    shared fixed-shape tile executable: a folder of N distinct-size photos
    compiles O(1) executables, not O(N). Outputs are written by the native
    threaded encoder when built (the serving counterpart of the threaded
    decoder — single-threaded PIL PNG encode caps the pipeline well below
    TPU SR rates); PIL fallback for both directions, and a file failing
    both encoders is skipped with a warning rather than aborting the job.
    Unreadable/corrupt inputs are skipped, like the training loader.
    Returns the number of images written; a compile/coverage summary is
    printed at the end.
    """
    import collections
    import os
    import sys
    from concurrent import futures

    from PIL import Image as PILImage

    from srgan_tpu import native
    from srgan_tpu.data.dataset import list_image_files

    if upscaler is None:
        from srgan_tpu.training.checkpoint import latest_ckpt_dir

        upscaler = (
            Upscaler.from_checkpoint(
                results_dir, prefix, enhance_output=enhance_output,
                mesh=mesh, ensemble=ensemble, tta=tta, ema=ema,
            )
            if latest_ckpt_dir(results_dir, prefix) is not None
            else Upscaler.random_init(enhance_output=enhance_output, mesh=mesh)
        )
    os.makedirs(output_dir, exist_ok=True)

    # Header-only size pass: no pixel decode, O(1) memory per file.
    buckets = collections.defaultdict(list)
    for fname in list_image_files(input_dir):
        try:
            with PILImage.open(os.path.join(input_dir, fname)) as im:
                buckets[(im.height, im.width)].append(fname)
        except Exception:
            continue  # unreadable — skip (training-loader parity)

    use_native = native.available()
    native_enc = use_native and native.encoder_available()

    def decode(h, w, chunk):
        paths = [os.path.join(input_dir, f) for f in chunk]
        imgs, names, retry = [], [], list(zip(chunk, paths))
        if use_native:
            batch, ok = native.load_batch(paths, h, w)
            imgs = [batch[j] for j in np.nonzero(ok)[0]]
            names = [f for f, o in zip(chunk, ok) if o]
            # Files the native decoder rejects (e.g. CMYK JPEG, exotic PNG
            # layouts) but PIL can read still get served — only files BOTH
            # decoders fail on are skipped.
            retry = [(f, p) for (f, p), o in zip(retry, ok) if not o]
        for f, p in retry:
            try:
                img = load_image(p)
            except Exception:
                continue
            if img.shape[:2] == (h, w):
                imgs.append(img)
                names.append(f)
            else:
                # Header pass said (h, w) but the pixel decode disagrees
                # (e.g. EXIF-rotated JPEG): the file can't join this
                # fixed-shape batch — skip VISIBLY so the caller can
                # account for it (ADVICE r2: silent drops hide files).
                print(
                    f"warning: {f}: decoded shape {img.shape[:2]} != "
                    f"header {(h, w)}; skipped",
                    file=sys.stderr,
                )
        return (np.stack(imgs) if imgs else
                np.zeros((0, h, w, 3), np.float32)), names

    def write_batch(sr_u8, out_paths):
        n_ok = 0
        if native_enc:
            ok = native.save_batch_u8(out_paths, sr_u8)
            n_ok += int(ok.sum())
            fails = np.nonzero(~ok)[0]
        else:
            fails = range(len(out_paths))
        for j in fails:  # exotic extension / no native: PIL fallback
            # Mirror the decode side's skip-and-continue policy: one
            # unwritable file (bad extension, disk error) must not abort
            # the remaining batches (ADVICE r2).
            try:
                PILImage.fromarray(sr_u8[j]).save(out_paths[j])
                n_ok += 1
            except Exception as e:
                print(
                    f"warning: failed to encode {out_paths[j]}: {e}; "
                    "skipped",
                    file=sys.stderr,
                )
        return n_ok

    # Three overlapping stages on distinct resources: C++ decode of batch
    # k+1, device SR + (tunnel) fetch of batch k, C++ encode of batch k-1.
    with futures.ThreadPoolExecutor(max_workers=1) as decoder, \
            futures.ThreadPoolExecutor(max_workers=1) as writer:
        writes = []
        written = 0

        def submit_write(sr_u8, out_paths):
            # keep the write pipeline 2-deep: each queued future pins its
            # whole uint8 batch, so an unbounded backlog would grow host
            # memory toward O(dataset) whenever encode runs slower than
            # SR + fetch
            nonlocal written
            while len(writes) >= 2:
                written += writes.pop(0).result()
            writes.append(writer.submit(write_batch, sr_u8, out_paths))

        direct = {
            hw: fnames
            for hw, fnames in buckets.items()
            if len(fnames) >= min_bucket_for_direct
        }
        odd = [
            (hw, f)
            for hw, fnames in buckets.items()
            if len(fnames) < min_bucket_for_direct
            for f in fnames
        ]

        for (h, w), fnames in direct.items():
            chunks = [
                fnames[i : i + batch_size]
                for i in range(0, len(fnames), batch_size)
            ]
            fut = decoder.submit(decode, h, w, chunks[0])
            for ci in range(len(chunks)):
                batch, names = fut.result()
                if ci + 1 < len(chunks):  # overlap decode with device SR
                    fut = decoder.submit(decode, h, w, chunks[ci + 1])
                if not len(batch):
                    continue
                # Pad short batches (tail chunk, or decode skips) to the
                # full batch shape: each direct bucket then traces exactly
                # ONE executable — a short tail would otherwise compile a
                # second one per bucket. Padding rows repeat image 0 and
                # are dropped after SR.
                n_real = len(batch)
                if n_real < batch_size:
                    batch = np.concatenate(
                        [batch,
                         np.repeat(batch[:1], batch_size - n_real, axis=0)]
                    )
                # uint8 off the device: quantization runs in the SR
                # executable, host link carries 4x fewer bytes.
                sr_u8 = upscaler.upscale_u8(batch)[:n_real]
                out_paths = [os.path.join(output_dir, f) for f in names]
                submit_write(sr_u8, out_paths)

        # Odd sizes (bucket smaller than min_bucket_for_direct): ONE shared
        # fixed-shape tile executable serves them all — no per-size compile.
        for (h, w), fname in odd:
            batch, names = decode(h, w, [fname])
            if not len(batch):
                continue
            sr = upscaler.upscale_tiled(
                batch[0], tile=tile, batch_size=tile_batch,
                overlap=min(tile_overlap, tile // 2),
                fetch_u8=True,  # u8 tiles over the host link, like direct
            )
            # host-side re-quantization, bit-matching infer_step_u8's
            # formula (identity on the u8-fetched tile values k/255)
            sr_u8 = np.floor(np.clip(sr, 0.0, 1.0) * 255.0 + 0.5).astype(
                np.uint8
            )[None]
            submit_write(sr_u8, [os.path.join(output_dir, names[0])])

        written += sum(w.result() for w in writes)
    if odd or len(direct) > 1:
        print(
            f"upscale_directory: {len(direct)} direct size bucket(s), "
            f"{len(odd)} odd-size file(s) via the shared tile executable "
            f"(≤ {len(direct) + 1} SR compiles total)",
            file=sys.stderr,
        )
    return written
