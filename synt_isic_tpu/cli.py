"""Headless batch-generation CLI producing ISIC2018_Task3-format synthetic
datasets.

Parity with reference `diffusion/console_generator_server.py`:
  * flags `--classes/--count/--class-counts/--output/--no-postprocess/
    --interactive/--list-classes` (:470-612) plus `--steps/--seed/--batch/
    --checkpoints/--scheduler` (rebuild additions);
  * default inference steps 1000 (:41), JPEG quality-95 outputs (:275),
    `ISIC_%07d.jpg` numbering continuing from the original dataset's last
    id 34320 (:50-51), one-hot ground-truth CSV appended across runs
    (:88-127), mean-shift color postprocessing (:129-168);
  * interactive class menu (:297-403).

TPU-native: batches go through the jitted scan sampler via ImageGenerator's
ModelManager instead of re-loading the model per image (the reference
reloads the checkpoint for EVERY image, `console_generator_server.py:220-242`).
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from .io.color_stats import load_color_statistics, apply_mean_shift_postprocessing
from .io.csv_io import append_groundtruth_row, initialize_groundtruth_csv
from .io.images import save_image, write_sidecar_metadata
from .diffusion.sampler import to_uint8_images
from .model_manager import ModelManager

LAST_ORIGINAL_ISIC_NUMBER = 34320  # last id of the real ISIC2018 Task3 set


class ConsoleGenerator:
    def __init__(self, base_dir: Optional[str] = None,
                 checkpoints_dir: Optional[str] = None,
                 inference_steps: int = 1000,
                 batch_size: int = 8,
                 scheduler: str = "ddpm",
                 timestep_spacing: str = "leading",
                 seed: Optional[int] = None,
                 model_config=None,
                 mesh=None,
                 model_variant: str = "best",
                 conditional: bool = False,
                 guidance_scale: float = 0.0,
                 guidance_map=None):
        self.base_dir = Path(base_dir) if base_dir else Path.cwd()
        ckpt = Path(checkpoints_dir) if checkpoints_dir else self.base_dir / "checkpoints"
        self.model_manager = ModelManager(checkpoints_dir=str(ckpt),
                                          model_config=model_config,
                                          variant=model_variant,
                                          conditional=conditional)
        self.guidance_scale = float(guidance_scale)
        # per-class guidance ({class: g}); ConsoleGenerator samples one
        # class per sampler call, so the map resolves to a scalar here
        self.guidance_map = dict(guidance_map) if guidance_map else None
        self.inference_steps = max(1, min(1000, inference_steps))
        self.batch_size = max(1, batch_size)
        self.scheduler = scheduler
        self.timestep_spacing = timestep_spacing
        self.seed = seed
        self.synthetic_dir = self.base_dir / "ISIC2018_Task3_synt"
        self.synthetic_csv = self.base_dir / "ISIC2018_Task3_GroundTruth_synt.csv"
        self.color_stats = load_color_statistics(ckpt / "color_statistics.json")
        self.last_isic_number = self._scan_last_number()
        # --dp-mesh: shard sampling batches over the mesh 'data' axis
        # (per-seed RNG streams keep outputs layout-independent)
        self.mesh = mesh

    def _scan_last_number(self) -> int:
        """Continue numbering from existing synthetic files (dataset-level
        resume) or from the original dataset's last id."""
        last = LAST_ORIGINAL_ISIC_NUMBER
        if self.synthetic_dir.exists():
            for p in self.synthetic_dir.glob("ISIC_*.jpg"):
                try:
                    last = max(last, int(p.stem.split("_")[1]))
                except (IndexError, ValueError):
                    continue
        return last

    def list_classes(self) -> List[str]:
        return self.model_manager.get_available_classes()

    def generate(self, class_counts: Dict[str, int],
                 output_dir: Optional[str] = None,
                 postprocess: bool = True) -> Dict[str, int]:
        out_dir = Path(output_dir) if output_dir else self.synthetic_dir
        out_dir.mkdir(parents=True, exist_ok=True)
        initialize_groundtruth_csv(self.synthetic_csv)
        produced: Dict[str, int] = {}
        rng = np.random.default_rng(self.seed)
        t_start = time.time()
        total = sum(class_counts.values())
        done = 0
        for class_name, count in class_counts.items():
            if not self.model_manager.load_model(class_name):
                print(f"!! no checkpoint for class {class_name}, skipping")
                produced[class_name] = 0
                continue
            g_class = (self.guidance_map.get(class_name, self.guidance_scale)
                       if self.guidance_map else self.guidance_scale)
            sampler = self.model_manager.create_sampler(
                self.inference_steps, scheduler=self.scheduler,
                timestep_spacing=self.timestep_spacing,
                guidance_scale=g_class)
            if self.mesh is not None:
                from .parallel.sharded_sampler import ShardedSampler

                sampler = ShardedSampler(sampler, self.mesh)
            params = self.model_manager.loaded_params[class_name]
            labels = (self.model_manager.class_id(class_name)
                      if self.model_manager.conditional else None)
            n = 0
            while n < count:
                block = min(self.batch_size, count - n)
                seeds = rng.integers(0, 0x7FFFFFFF, size=block, dtype=np.int64) \
                    .astype(np.uint32)
                out = sampler.sample(params, seeds, class_labels=labels)
                images = to_uint8_images(out["images"])
                for j in range(block):
                    arr = images[j]
                    if postprocess:
                        arr = apply_mean_shift_postprocessing(
                            arr, self.color_stats.get(class_name)
                            if self.color_stats else None)
                    self.last_isic_number += 1
                    name = f"ISIC_{self.last_isic_number:07d}.jpg"
                    path = out_dir / name
                    from PIL import Image as PILImage
                    save_image(PILImage.fromarray(arr), str(path), quality=95)
                    # full reproduce contract for console artifacts too:
                    # record the sampler actually used, the JPEG encode
                    # settings, and (for multi-image blocks) the device
                    # block layout — without `kind`/`dtype` a DDIM bf16 run
                    # would mis-reproduce as DDPM f32, and without `block`
                    # a batch-8 image regenerated at batch 1 is not
                    # byte-stable under XLA's batch-dependent float tiling
                    import jax.numpy as jnp
                    write_sidecar_metadata(
                        str(path), class_name=class_name, seed=int(seeds[j]),
                        inference_steps=self.inference_steps,
                        device=str(self.model_manager.device),
                        noise_hash=out["noise_hashes"][j],
                        scheduler={
                            "num_train_timesteps": 1000,
                            "beta_schedule": "squaredcos_cap_v2",
                            "prediction_type": "epsilon",
                            "kind": self.scheduler,
                            "ddim_eta": 0.0,
                            "timestep_spacing": self.timestep_spacing,
                            "dtype": jnp.dtype(self.model_manager.dtype).name,
                            "model_variant": self.model_manager.variant,
                            **({"attention_fast_math": True}
                               if self.model_manager.attention_fast_math
                               else {}),
                            **({"conditional": True,
                                # the EFFECTIVE weight for this class (the
                                # console samples one class per call, so
                                # the scalar fully pins the reproduce)
                                "guidance_scale": g_class}
                               if self.model_manager.conditional else {}),
                        },
                        extra={
                            "artifact": {
                                "format": "jpeg", "quality": 95,
                                "postprocess": ("mean_shift" if postprocess
                                                else None),
                            },
                            # a mesh-sharded block is additionally
                            # layout-dependent (per-device shard shapes
                            # change XLA's float tiling), so the device
                            # count is part of the reproduce contract —
                            # recorded even for 1-image blocks, which
                            # still pad+shard across the mesh
                            **({"block": {
                                "seeds": [int(s) for s in seeds],
                                "index": j,
                                **({"dp_mesh":
                                    int(self.mesh.devices.size)}
                                   if self.mesh is not None else {}),
                            }} if block > 1 or self.mesh is not None
                               else {}),
                        })
                    append_groundtruth_row(self.synthetic_csv, name, class_name)
                    n += 1
                    done += 1
                print(f"  {class_name}: {n}/{count} "
                      f"(total {done}/{total}, {time.time() - t_start:.1f}s)")
            produced[class_name] = n
        return produced


def _parse_class_counts(spec: str) -> Dict[str, int]:
    """'MEL:50,NV:20' -> {'MEL': 50, 'NV': 20}"""
    counts: Dict[str, int] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        cls, _, num = part.partition(":")
        counts[cls.strip()] = int(num)
    return counts


def interactive_menu(gen: ConsoleGenerator) -> Optional[Dict[str, int]]:
    classes = gen.list_classes()
    print("available classes:")
    for i, cls in enumerate(classes, 1):
        print(f"  {i}. {cls}")
    print("enter selections as 'MEL:50,NV:20' (empty to quit):")
    line = input("> ").strip()
    if not line:
        return None
    return _parse_class_counts(line)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="synt-isic-generate",
        description="TPU batch generator for synthetic ISIC2018 images")
    p.add_argument("--classes", nargs="*", help="class names to generate")
    p.add_argument("--count", type=int, default=10,
                   help="images per class (with --classes)")
    p.add_argument("--class-counts", type=str,
                   help="per-class counts, e.g. 'MEL:50,NV:20'")
    p.add_argument("--output", type=str, help="output directory")
    p.add_argument("--no-postprocess", action="store_true",
                   help="disable color postprocessing")
    p.add_argument("--interactive", action="store_true")
    p.add_argument("--list-classes", action="store_true")
    p.add_argument("--base-dir", type=str, default=None)
    p.add_argument("--checkpoints", type=str, default=None)
    p.add_argument("--steps", type=int, default=1000,
                   help="inference steps (1-1000)")
    p.add_argument("--batch", type=int, default=8, help="device batch size")
    p.add_argument("--scheduler",
                   choices=["ddpm", "ddim", "dpm_solver", "dpm_solver_sde", "unipc"],
                   default="ddpm")
    p.add_argument("--timestep-spacing", choices=["leading", "trailing"],
                   default="leading",
                   help="'leading' = reference parity; 'trailing' always "
                        "visits t=T-1 — the standard few-step quality fix "
                        "(recorded in sidecars for --reproduce)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--model-variant", default="best", metavar="V",
                   help="checkpoint variant to sample: 'best' = reference "
                        "naming unet_<CLASS>_best.pth; a progressive-"
                        "distillation student is e.g. 'distill8' (sample it "
                        "with --steps 8 --timestep-spacing trailing). "
                        "Recorded in sidecars for --reproduce")
    p.add_argument("--conditional", action="store_true",
                   help="sample the single class-conditional checkpoint "
                        "(unet_conditional_<variant>.pth + its .json "
                        "metadata, train/train_conditional.py) instead of "
                        "per-class models")
    p.add_argument("--guidance-map", default=None, metavar="SPEC",
                   help="per-class guidance for --conditional, e.g. "
                        "'MEL=2.5,NV=2': each class samples at its own "
                        "weight (absent classes use --guidance-scale; "
                        "weights <= 1 mean no guidance — plain "
                        "conditional, same as the scalar flag); "
                        "measured optima: scripts/e2e_conditional.py "
                        "per_class_best_guidance")
    p.add_argument("--guidance-scale", type=float, default=0.0, metavar="S",
                   help="classifier-free guidance weight for --conditional "
                        "(0/1 = plain conditional; >1 = guided, 2x UNet "
                        "evals per step). Recorded in sidecars")
    p.add_argument("--dp-mesh", type=int, default=0, metavar="N",
                   help="shard sampling over an N-device data-parallel "
                        "mesh (-1 = all local devices; 0 = single device). "
                        "Per-seed RNG streams keep images identical to the "
                        "single-device run")
    p.add_argument("--augment-source", type=str, metavar="IMAGE",
                   help="img2img mode (beyond reference): forward-noise this "
                        "image to --augment-strength of the walk and denoise "
                        "with the configured sampler (ddpm/ddim only). "
                        "Requires exactly one class via --classes; writes "
                        "--count variants to --output with full sidecars "
                        "(reproducible via --reproduce + the source file)")
    p.add_argument("--augment-strength", type=float, default=0.6, metavar="S",
                   help="fraction of the reverse walk to run on the source "
                        "(0<S<=1; lower = closer to the source)")
    p.add_argument("--augment-mask", type=str, metavar="MASK",
                   help="optional grayscale mask PNG for inpainting: white "
                        "(1) = regenerate, black (0) = keep the source pixel")
    p.add_argument("--reproduce", type=str, metavar="SIDECAR_JSON",
                   help="regenerate the exact image recorded by a per-image "
                        "sidecar JSON (seed + steps + scheduler config; "
                        "verified via the recorded noise hash). Use "
                        "--no-postprocess if the original was generated "
                        "without color postprocessing to get identical bytes")
    return p


def _reproduce_console_jpeg(gen, meta: dict, out_path: str) -> bool:
    """Regenerate a ConsoleGenerator JPEG artifact byte-identically: the
    recorded device block through the recorded sampler, mean-shift color
    postprocessing when it was applied, then the exact JPEG encode
    (quality as recorded). Writes a sidecar next to the output so the
    caller's noise-hash check works unchanged."""
    from PIL import Image as PILImage

    art = meta["artifact"]
    cls = meta["class"]
    blk = meta.get("block") or {"seeds": [int(meta["seed"])], "index": 0}
    idx = int(blk["index"])
    seeds = np.asarray(blk["seeds"], np.uint32)
    out = gen._sample_block([cls] * len(seeds), seeds, False)
    if out is None:
        return False
    img = to_uint8_images(np.asarray(out["images"]))[idx]
    if art.get("postprocess") == "mean_shift":
        stats = load_color_statistics(
            Path(gen.model_manager.checkpoints_dir) / "color_statistics.json")
        img = apply_mean_shift_postprocessing(
            img, (stats or {}).get(cls) if stats else None)
    save_image(PILImage.fromarray(img), out_path,
               quality=int(art.get("quality", 95)))
    write_sidecar_metadata(out_path, class_name=cls,
                           seed=int(seeds[idx]),
                           inference_steps=int(meta["inference_steps"]),
                           device=str(gen.model_manager.device),
                           noise_hash=out["noise_hashes"][idx],
                           scheduler=meta.get("scheduler"),
                           extra={"artifact": art,
                                  **({"block": blk}
                                     if len(seeds) > 1 or "dp_mesh" in blk
                                     else {})})
    return True


def reproduce_from_sidecar(sidecar_path: str, checkpoints_dir: Optional[str],
                           output: Optional[str] = None,
                           postprocess: bool = True,
                           model_config=None) -> int:
    """Regenerate the image a sidecar JSON records (the reproducibility
    contract of reference `image_generator.py:456-477`: same seed + steps +
    scheduler config => same trajectory). The regenerated sidecar's
    `noise_hash` must equal the original's — a mismatch means the wrong
    checkpoint/config and exits nonzero."""
    import json

    meta = json.loads(Path(sidecar_path).read_text(encoding="utf-8"))
    cls, seed = meta["class"], meta["seed"]
    if seed is None:
        print("sidecar records no seed — cannot reproduce", file=sys.stderr)
        return 1
    import jax.numpy as jnp

    from .generator import ImageGenerator

    sched = meta.get("scheduler") or {}
    # rebuild with the recorded compute dtype — served images default to
    # bf16 and would never byte-match an f32 regeneration. Sidecars that
    # PREDATE dtype recording may come from either default (the CLI/GUI
    # wrote f32, the serve daemon wrote bf16), so when the original image
    # is present we try f32 first and retry with bf16 before declaring
    # non-reproduction.
    dtype_recorded = "dtype" in sched
    candidates = ([jnp.dtype(sched["dtype"])] if dtype_recorded
                  else [jnp.dtype("float32"), jnp.dtype("bfloat16")])
    kind_recorded = "kind" in sched
    if not kind_recorded:
        # sidecars that predate kind-recording can only be ASSUMED ddpm
        # (the reference's only sampler) — then byte comparison against the
        # original is the sole proof, and without it we exit 2, not 0
        print("warning: sidecar predates sampler-kind recording — assuming "
              "the DDPM ancestral sampler", file=sys.stderr)
    art = meta.get("artifact") or {}
    ext = ".jpg" if art.get("format") == "jpeg" else ".png"
    reproduced_name = Path(meta["filename"]).stem + "_reproduced" + ext
    if output is None:
        out_path = str(Path(sidecar_path).with_name(reproduced_name))
    elif output.lower().endswith((".png", ".jpg", ".jpeg")):
        # byte identity requires re-encoding in the RECORDED format — the
        # encoder is picked from the extension, so an --output extension
        # that disagrees with the sidecar's artifact format would silently
        # re-encode (PNG<->JPEG) and the byte comparison could never pass.
        # Correct the extension instead of failing with a false DIFFER.
        same_family = (output.lower().endswith((".jpg", ".jpeg"))
                       if ext == ".jpg" else output.lower().endswith(".png"))
        if not same_family:
            corrected = str(Path(output).with_suffix(ext))
            print(f"warning: --output extension {Path(output).suffix!r} "
                  f"does not match the recorded artifact format "
                  f"({art.get('format', 'png')}); writing {corrected}",
                  file=sys.stderr)
            output = corrected
        out_path = output
    else:  # a directory
        Path(output).mkdir(parents=True, exist_ok=True)
        out_path = str(Path(output) / reproduced_name)
    original = Path(sidecar_path).with_name(meta["filename"])

    # a block sampled data-parallel over a mesh is layout-dependent:
    # byte identity requires rebuilding with the SAME device count
    # (per-device shard shapes change XLA's float tiling)
    mesh = None
    blk_mesh = (meta.get("block") or {}).get("dp_mesh")
    if blk_mesh:
        import jax

        n_dev = int(blk_mesh)
        if len(jax.devices()) < n_dev:
            print(f"sidecar block was sampled data-parallel over {n_dev} "
                  f"devices; this host has {len(jax.devices())} — byte "
                  f"identity is device-layout-dependent and cannot be "
                  f"verified here", file=sys.stderr)
            return 2
        from .parallel.mesh import create_mesh

        mesh = create_mesh({"data": n_dev})

    for i, compute_dtype in enumerate(candidates):
        gen = ImageGenerator(checkpoints_dir=checkpoints_dir,
                             model_config=model_config,
                             compute_dtype=compute_dtype,
                             # sidecars that predate variant recording were
                             # always written from the 'best' checkpoint
                             model_variant=sched.get("model_variant", "best"),
                             # conditional single-checkpoint sidecars record
                             # the mode + CFG weight; class id re-derives
                             # from the class name via checkpoint metadata
                             conditional=bool(sched.get("conditional", False)),
                             guidance_scale=float(sched.get("guidance_scale",
                                                            0.0)),
                             # per-class guidance: the recorded map must be
                             # rebuilt verbatim — the table branch's math
                             # (and a mixed-class block's bytes) depends on
                             # every row, not just this image's scalar g
                             guidance_map=sched.get("guidance_map"))
        gen.set_inference_steps(int(meta["inference_steps"]))
        if mesh is not None:
            gen.set_mesh(mesh)
        gen.scheduler_kind = sched.get("kind", "ddpm")
        gen.ddim_eta = float(sched.get("ddim_eta", 0.0))
        # sidecars that predate spacing-recording were always 'leading'
        gen.timestep_spacing = sched.get("timestep_spacing", "leading")
        if sched.get("attention_fast_math"):
            # the original sampled with bf16-exponential attention — bytes
            # only match when the regeneration does too
            gen.model_manager.set_attention_tuning(fast_math=True)
        if sched.get("png_compress_level") is not None:
            # PNG bytes depend on the zlib level the original was encoded
            # with (pixels are identical either way)
            gen.png_compress_level = int(sched["png_compress_level"])
        i2i = meta.get("img2img")
        if i2i:
            # augmented image: rebuild needs the ORIGINAL source file (and
            # mask) next to the sidecar, verified by recorded SHA-256
            import hashlib as _hashlib

            def _resolve(kind: str):
                name = i2i.get(kind)
                if not name:
                    print(f"sidecar records an img2img run from an in-memory "
                          f"{kind} array — cannot reproduce without the "
                          f"original file", file=sys.stderr)
                    return None, 2
                # next-to-sidecar wins (portable runs); fall back to the
                # recorded absolute path. Accept the FIRST candidate whose
                # sha256 matches — a stale same-named neighbor must not
                # block reproduction while the pristine original still
                # exists at the recorded path
                candidates_p = [Path(sidecar_path).with_name(name)]
                if i2i.get(f"{kind}_path"):
                    candidates_p.append(Path(i2i[f"{kind}_path"]))
                existing = [c for c in candidates_p if c.exists()]
                if not existing:
                    print(f"img2img {kind} file {name} not found next to the "
                          f"sidecar or at its recorded path — cannot "
                          f"reproduce", file=sys.stderr)
                    return None, 1
                for p in existing:
                    digest = _hashlib.sha256(p.read_bytes()).hexdigest()
                    if digest == i2i.get(f"{kind}_sha256"):
                        return p, 0
                print(f"img2img {kind} file(s) "
                      f"{', '.join(str(p) for p in existing)} CHANGED since "
                      f"the run (sha256 mismatch)", file=sys.stderr)
                return None, 1

            src, rc = _resolve("source")
            if src is None:
                return rc
            mask_p = None
            if i2i.get("mask_sha256"):
                mask_p, rc = _resolve("mask")
                if mask_p is None:
                    return rc
            ok, _ = gen.augment_single_image(
                cls, str(src), out_path,
                strength=float(i2i["strength"]),
                mask=(str(mask_p) if mask_p else None),
                # the img2img block records its own postprocess setting —
                # no --no-postprocess guesswork needed for augmented runs
                postprocess=bool(i2i.get("postprocess", False)),
                seed=int(seed))
        elif art.get("format") == "jpeg":
            # console-CLI artifact: JPEG at the recorded quality with
            # mean-shift postprocessing — a PNG/color-stats regeneration
            # could never byte-match, so this path re-encodes exactly as
            # ConsoleGenerator.generate did (same block layout included)
            ok = _reproduce_console_jpeg(gen, meta, out_path)
        elif meta.get("block"):
            # the image came from a multi-image device block — byte identity
            # requires rebuilding the SAME block (XLA's float tiling is
            # batch-shape-dependent), then extracting the recorded index
            ok = gen.regenerate_block_image(cls, out_path,
                                            postprocess=postprocess,
                                            block=meta["block"])
        else:
            ok, _ = gen.generate_single_image(cls, out_path,
                                              postprocess=postprocess,
                                              seed=int(seed))
        if not ok:
            print(f"generation failed for class {cls}", file=sys.stderr)
            return 1
        redo = json.loads(Path(out_path).with_suffix(".json")
                          .read_text(encoding="utf-8"))
        # the noise hash covers only the seed->initial-noise pipeline (it
        # is independent of checkpoint, sampler AND compute dtype); byte
        # comparison against the original image, when it is still next to
        # the sidecar, is the full check
        if meta.get("noise_hash") and redo.get("noise_hash") != meta["noise_hash"]:
            print(f"initial-noise hash MISMATCH: {redo.get('noise_hash')} != "
                  f"{meta['noise_hash']} (seed pipeline changed)",
                  file=sys.stderr)
            return 1
        if original.exists():
            if original.read_bytes() == Path(out_path).read_bytes():
                suffix = ("" if dtype_recorded
                          else f" (legacy sidecar; compute dtype "
                               f"{compute_dtype.name})")
                print(f"reproduced {meta['filename']} -> {out_path} "
                      f"(byte-identical to the original){suffix}")
                return 0
            if i + 1 < len(candidates):
                print(f"bytes differ with {compute_dtype.name}; sidecar "
                      f"predates dtype recording — retrying with "
                      f"{candidates[i + 1].name} (the serve default)",
                      file=sys.stderr)
                continue
            tried = "/".join(c.name for c in candidates)
            print(f"reproduced {meta['filename']} -> {out_path}, but bytes "
                  f"DIFFER from the original (tried dtype {tried}; "
                  f"different checkpoint, or postprocess mismatch — try "
                  f"--no-postprocess)", file=sys.stderr)
            return 1
        # no original to compare: the dtype assumption is unverifiable, so
        # retrying is pointless — report what WAS verified and stop
        print(f"reproduced {meta['filename']} -> {out_path} "
              f"(initial-noise hash verified; original not present for "
              f"byte comparison)")
        if not kind_recorded or not dtype_recorded:
            assumed = []
            if not kind_recorded:
                assumed.append("sampler kind")
            if not dtype_recorded:
                assumed.append("compute dtype")
            print(f"UNVERIFIED: {' and '.join(assumed)} assumed and the "
                  f"original image is not available to compare against",
                  file=sys.stderr)
            return 2
        return 0
    return 1


def augment_from_cli(args, model_config=None) -> int:
    """--augment-source driver: N img2img/inpainting variants of one source
    image through the production artifact path (sidecars + reproduce)."""
    from .generator import ImageGenerator

    if not args.classes or len(args.classes) != 1:
        print("--augment-source requires exactly one class via --classes",
              file=sys.stderr)
        return 1
    if args.scheduler not in ("ddpm", "ddim"):
        print(f"--augment-source supports ddpm/ddim only (multistep solver "
              f"histories cannot start mid-walk); got {args.scheduler}",
              file=sys.stderr)
        return 1
    cls = args.classes[0]
    out_dir = Path(args.output) if args.output else Path.cwd() / "augmented"
    out_dir.mkdir(parents=True, exist_ok=True)
    gen = ImageGenerator(checkpoints_dir=args.checkpoints,
                         model_config=model_config,
                         model_variant=args.model_variant,
                         conditional=args.conditional,
                         guidance_scale=args.guidance_scale)
    gen.set_inference_steps(args.steps)
    gen.scheduler_kind = args.scheduler
    gen.timestep_spacing = args.timestep_spacing
    stem = Path(args.augment_source).stem
    n_ok = 0
    for i in range(max(1, args.count)):
        seed = (int(args.seed) + i) if args.seed is not None else None
        out_path = str(out_dir / f"{stem}_aug_{i:04d}.png")
        ok, _ = gen.augment_single_image(
            cls, args.augment_source, out_path,
            strength=args.augment_strength, mask=args.augment_mask,
            # postprocess stays OFF for augmentation: the per-class
            # mean-shift would recolor the preserved source region
            postprocess=False, seed=seed)
        n_ok += int(ok)
    print(f"augmented {n_ok}/{max(1, args.count)} -> {out_dir}")
    # partial success is a failure for scripted callers: anything short of
    # the requested count must be visible in the exit code, not just the log
    return 0 if n_ok == max(1, args.count) else 1


def main(argv: Optional[List[str]] = None) -> int:
    from .utils.compute import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    if args.reproduce:
        return reproduce_from_sidecar(args.reproduce, args.checkpoints,
                                      output=args.output,
                                      postprocess=not args.no_postprocess)
    if args.augment_source:
        return augment_from_cli(args)
    mesh = None
    if args.dp_mesh:
        from .parallel.mesh import create_mesh

        mesh = create_mesh({"data": args.dp_mesh})
    from .generator import parse_guidance_map

    gen = ConsoleGenerator(base_dir=args.base_dir, checkpoints_dir=args.checkpoints,
                           inference_steps=args.steps, batch_size=args.batch,
                           scheduler=args.scheduler, seed=args.seed,
                           timestep_spacing=args.timestep_spacing,
                           mesh=mesh, model_variant=args.model_variant,
                           conditional=args.conditional,
                           guidance_scale=args.guidance_scale,
                           guidance_map=parse_guidance_map(args.guidance_map))
    if args.list_classes:
        classes = gen.list_classes()
        if not classes:
            print(f"no model checkpoints (unet_<CLASS>_best.pth) found in "
                  f"{gen.model_manager.checkpoints_dir}", file=sys.stderr)
        for cls in classes:
            print(cls)
        return 0
    if args.interactive:
        counts = interactive_menu(gen)
        if not counts:
            return 0
    elif args.class_counts:
        counts = _parse_class_counts(args.class_counts)
    elif args.classes:
        counts = {cls: args.count for cls in args.classes}
    else:
        counts = {cls: args.count for cls in gen.list_classes()}
    if not counts:
        print("nothing to generate (no classes found)")
        return 1
    produced = gen.generate(counts, output_dir=args.output,
                            postprocess=not args.no_postprocess)
    print(f"done: {produced}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
