"""Text-conditioned stochastic latent pipelines: SD v1.4 (512px) and LDM
text2img-large (256px) zero-shot image editing.

Parity with ``model/gan_wrapper/stable_diffusion_stochastic_text_wrapper.py``
and ``latentdiff_stochastic_text_wrapper.py``:

* ``encode(image, encode_text)`` -> z-ensemble ordered ``trial -> enc_scale ->
  skip`` (:189-191), each z flattened with x_T first and
  ``(white_box_steps - skip)`` entries (:203, :146-156).
* ``forward(z_ensemble, original, enc_text, dec_text)`` -> decode each z under
  every decoder guidance scale, score all candidates with DirectionalCLIP,
  argmax per sample (:208-247); also returns the winning (enc_scale,
  dec_scale, skip) combos the reference prints.

TPU-first design: the VAE posterior is sampled ONCE per image (as in the
reference) and shared by all chains; candidates sharing a ``skip`` value share
one compiled scan, vmapped over (trial x enc_scale) with the guidance scale a
*traced* scalar so scale sweeps don't recompile; decoding vmaps candidates x
decoder scales in the same way; CLIP ranking embeds text twice and the
original once, then scores the whole candidate batch in one call.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cyclediffusion_tpu.energy.clean_clip import DirectionalCLIP
from cyclediffusion_tpu.ops.cfg import cfg_model_fn, cfg_model_fn_pair
from cyclediffusion_tpu.pipelines.latent import LatentCoreSpec, LatentDiffusionCore
from cyclediffusion_tpu.samplers import ddim_decode, dpm_encode, num_recovered_eps


# CFG with a traced per-candidate ``scale`` (one compiled program serves the
# whole scale sweep — the general combine is exact for scales 0/1 too,
# ddim.py:513-517).  The concat/split/combine core lives in ops/cfg.py;
# passing a traced array routes both wrappers to the always-dual-batch path.
_guided_model_fn = cfg_model_fn
_guided_model_fn_pair = cfg_model_fn_pair


class StochasticTextPipeline:
    """Shared implementation behind SDStochasticText / LatentDiffStochasticText."""

    def __init__(
        self,
        core: LatentDiffusionCore,
        tokenizer,
        directional_clip: Optional[DirectionalCLIP],
        *,
        custom_steps: int,
        eta: float,
        white_box_steps: int,
        skip_steps: Sequence[int],
        encoder_unconditional_guidance_scales: Sequence[float],
        decoder_unconditional_guidance_scales: Sequence[float],
        n_trials: int,
        candidate_chunk: Optional[int] = None,
        mesh=None,
        fast_key_every: Optional[int] = None,
    ):
        assert eta > 0
        assert core.spec.cond_kind is not None
        self.core = core
        self.tokenizer = tokenizer
        self.directional_clip = directional_clip
        self.custom_steps = custom_steps
        self.eta = eta
        self.white_box_steps = white_box_steps
        self.skip_steps = list(skip_steps)
        self.enc_scales = list(encoder_unconditional_guidance_scales)
        self.dec_scales = list(decoder_unconditional_guidance_scales)
        self.n_trials = n_trials
        # opt-in Faster-Diffusion decode (encoder-feature caching): run the
        # UNet encoder only every `fast_key_every` steps.  OFF the fixed-seed
        # parity path; validate with tools/parity_drift.py --fast-mode.
        self.fast_key_every = fast_key_every
        # cap on candidates processed per vmapped launch: the effective UNet
        # batch is 2 * batch * chunk (CFG dual batch), which at the reference
        # SD config (15 trials x 16 images) would not fit HBM unchunked
        self.candidate_chunk = candidate_chunk
        # optional device mesh: the candidate axis (the workload's natural
        # "long axis", SURVEY §5 — up to 540 candidates/sample) is sharded
        # over the mesh's ``data`` axis; params/conditioning replicate.
        # Launch sizes are padded to a multiple of the data-axis extent.
        self.mesh = mesh

        self.sched = core.make_ddim_schedule(custom_steps, eta)
        self.resolution = core.spec.resolution

        # params are always traced ARGUMENTS of the jits below — closing over
        # them would bake the full SD weight set into each program as
        # constants (see LatentDiffusionCore docstring)
        self._cond_jit = jax.jit(
            lambda p, ids: core.get_learned_conditioning(ids, params=p)
        )
        self._x0_jit = jax.jit(self._compute_x0)
        # per-skip compiled encode/decode (few distinct skips -> few programs)
        self._encode_skip = {
            s: jax.jit(functools.partial(self._encode_chains, skip=s))
            for s in sorted(set(self.skip_steps))
        }
        self._decode_skip = {
            s: jax.jit(functools.partial(self._decode_chains, skip=s))
            for s in sorted(set(self.skip_steps))
        }
        self._decode_jit = jax.jit(
            lambda p, z: core.decode_first_stage(z, params=p)
        )
        self._sip_at_trace = core.split_input_params

    # ---- mesh plumbing ---------------------------------------------------- #

    @property
    def _data_extent(self) -> int:
        if self.mesh is None:
            return 1
        return int(self.mesh.shape.get("data", 1))

    def _pad_launch(self, sub: list, chunk: int, c0: int) -> list:
        """Pad a launch's candidate list: tail chunks keep the chunk's
        compiled shape, and every launch rounds up to the data-axis extent."""
        want = chunk if (len(sub) < chunk and c0 > 0) else len(sub)
        ext = self._data_extent
        want = ((want + ext - 1) // ext) * ext
        return sub + sub[-1:] * (want - len(sub))

    def _shard_candidate_axis(self, *arrays):
        """device_put candidate-leading arrays over the ``data`` axis."""
        if self.mesh is None:
            return arrays
        from jax.sharding import NamedSharding, PartitionSpec as P

        out = tuple(
            jax.device_put(
                a, NamedSharding(self.mesh, P("data", *([None] * (a.ndim - 1))))
            )
            for a in arrays
        )
        return out

    def _shard_rows(self, a):
        """Re-shard a row-major array over the ``data`` axis (no-op off-mesh)."""
        if self.mesh is None:
            return a
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(
            a, NamedSharding(self.mesh, P("data", *([None] * (a.ndim - 1))))
        )

    def _replicated(self, *trees):
        if self.mesh is None:
            return trees
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())
        return tuple(
            jax.tree.map(lambda a: jax.device_put(a, rep), t) for t in trees
        )

    # ---- conditioning --------------------------------------------------- #

    def get_condition(self, texts) -> jnp.ndarray:
        """c context for texts; uc is the encoding of "" (reference :28-36)."""
        return self._cond_jit(self.core.params, self.tokenizer(list(texts)))

    def uncond(self, batch: int) -> jnp.ndarray:
        return self.get_condition([""] * batch)

    # ---- first stage ----------------------------------------------------- #

    def _compute_x0(self, params, image01, key):
        spec = self.core.spec
        image = (image01 - 0.5) * 2.0
        if spec.fs_kind == "kl":
            noise = jax.random.normal(
                key,
                (image.shape[0], spec.image_size, spec.image_size,
                 spec.embed_dim),
            )
            return self.core.encode_first_stage(image, noise, params)
        return self.core.encode_first_stage(image, params=params)

    # ---- chains ---------------------------------------------------------- #

    def _apply_fn(self, params):
        return lambda x, t, c: self.core.apply_model(x, t, c, params)

    @staticmethod
    def _fold(a, K):
        """Tile a (B, ...) operand K times along a folded (K*B, ...) axis."""
        return jnp.tile(a, (K,) + (1,) * (a.ndim - 1))

    def _encode_chains(self, params, x0, c_ctx, uc_ctx, scales, keys, *, skip):
        """DPM-Encoder over K candidates at one skip value, candidates FOLDED
        into the batch axis (K*B).

        A big batched UNet program is the natural TPU shape — and a vmapped
        ``pallas_call`` lifts the candidate axis into the flash kernel's
        blocks, doubling its VMEM footprint past the 16MB budget at the
        reference ensemble size (observed compile OOM).  Per-candidate PRNG
        streams are preserved bit-exactly by drawing each candidate's chain
        noises with the same key math the samplers use and injecting them
        through the noise seam.

        scales: (K,), keys: (K,) -> (xT: (K,B,h,w,c), eps: (K,n,B,h,w,c)).
        """
        apply = self._apply_fn(params)
        K = scales.shape[0]
        B = x0.shape[0]
        n = num_recovered_eps(self.sched.num_steps, self.white_box_steps, skip)

        def draw(key):  # exactly dpm_encode's internal stream, per candidate
            k_xT, k_post = jax.random.split(key)
            xT_noise = jax.random.normal(k_xT, x0.shape, x0.dtype)
            post = jax.random.normal(k_post, (n,) + x0.shape, x0.dtype)
            return xT_noise, post

        xT_noise, post = jax.vmap(draw)(keys)       # (K,B,...), (K,n,B,...)
        xT_noise = xT_noise.reshape((K * B,) + x0.shape[1:])
        post = jnp.moveaxis(post, 0, 1).reshape((n, K * B) + x0.shape[1:])

        x0_f = self._fold(x0, K)
        uc_f = self._fold(uc_ctx, K)
        c_f = self._fold(c_ctx, K)
        scale_f = jnp.repeat(scales, B).reshape((K * B,) + (1,) * (x0.ndim - 1))

        if self.fast_key_every and self.fast_key_every > 1:
            from cyclediffusion_tpu.samplers import dpm_encode_cached

            apply_cached = lambda x, t, c, cache: self.core.apply_model_cached(
                x, t, c, encoder_cache=cache, params=params)
            key_fn, reuse_fn = _guided_model_fn_pair(
                apply_cached, uc_f, c_f, scale_f)
            xT, eps = dpm_encode_cached(
                key_fn, reuse_fn, self.sched, x0_f, keys[0],
                white_box_steps=self.white_box_steps,
                key_every=self.fast_key_every, skip_steps=skip,
                xT_noise=xT_noise, posterior_noises=post)
        else:
            fn = _guided_model_fn(apply, uc_f, c_f, scale_f)
            xT, eps = dpm_encode(
                fn, self.sched, x0_f, keys[0],
                white_box_steps=self.white_box_steps, skip_steps=skip,
                xT_noise=xT_noise, posterior_noises=post)

        xT = xT.reshape((K, B) + xT.shape[1:])
        eps = jnp.moveaxis(
            eps.reshape((n, K, B) + eps.shape[2:]), 0, 1)   # (K,n,B,...)
        return xT, eps

    def _decode_chains(self, params, xT, eps, c_ctx, uc_ctx, scales, keys, *,
                       skip):
        """Replay over K candidates at one skip, candidates folded into the
        batch axis (see _encode_chains) -> latent samples (K, B, h, w, c)."""
        apply = self._apply_fn(params)
        K, B = xT.shape[0], xT.shape[1]
        n = eps.shape[1]
        refine = self.sched.num_steps - skip

        xT_f = xT.reshape((K * B,) + xT.shape[2:])
        eps_f = jnp.moveaxis(eps, 1, 0).reshape((n, K * B) + eps.shape[3:])
        if n < refine:
            # match ddim_decode's per-candidate fresh-noise stream exactly
            def draw(key):
                return jax.random.normal(
                    key, (refine - n,) + xT.shape[1:], xT_f.dtype)

            fresh = jax.vmap(draw)(keys)            # (K, refine-n, B, ...)
            fresh = jnp.moveaxis(fresh, 0, 1).reshape(
                (refine - n, K * B) + xT.shape[2:])
            eps_f = jnp.concatenate([eps_f, fresh], axis=0)

        uc_f = self._fold(uc_ctx, K)
        c_f = self._fold(c_ctx, K)
        scale_f = jnp.repeat(scales, B).reshape(
            (K * B,) + (1,) * (xT_f.ndim - 1))

        if self.fast_key_every and self.fast_key_every > 1:
            from cyclediffusion_tpu.samplers import ddim_decode_cached

            apply_cached = lambda x, t, c, cache: self.core.apply_model_cached(
                x, t, c, encoder_cache=cache, params=params)
            key_fn, reuse_fn = _guided_model_fn_pair(
                apply_cached, uc_f, c_f, scale_f)
            sample = ddim_decode_cached(
                key_fn, reuse_fn, self.sched, xT_f, eps_f, None,
                key_every=self.fast_key_every, skip_steps=skip)
        else:
            fn = _guided_model_fn(apply, uc_f, c_f, scale_f)
            sample = ddim_decode(fn, self.sched, xT_f, eps_f, None,
                                 skip_steps=skip)

        return sample.reshape((K, B) + sample.shape[1:])

    # ---- reference protocol ---------------------------------------------- #

    def encode(self, image01, encode_text, key) -> List[jnp.ndarray]:
        """-> z_ensemble (list, order trial -> enc_scale -> skip), flattened."""
        assert image01.shape[1] == image01.shape[2] == self.resolution
        self.core.guard_split_setting(self._sip_at_trace)
        bsz = image01.shape[0]
        k_vae, k_chains = jax.random.split(jnp.asarray(key))
        x0 = self._x0_jit(self.core.params, image01, k_vae)
        c_ctx = self.get_condition(list(encode_text))
        uc_ctx = self.uncond(bsz)

        combos = [
            (trial, es, sk)
            for trial in range(self.n_trials)
            for es in self.enc_scales
            for sk in self.skip_steps
        ]
        keys = jax.random.split(k_chains, len(combos))

        params, x0, c_ctx, uc_ctx = self._replicated(
            self.core.params, x0, c_ctx, uc_ctx)
        # group by skip -> one vmapped call per distinct skip, in chunks;
        # the candidate axis is sharded over the mesh's data axis
        results = {}
        for skip in sorted(set(self.skip_steps)):
            idxs = [i for i, (_, _, sk) in enumerate(combos) if sk == skip]
            chunk = self.candidate_chunk or len(idxs)
            for c0 in range(0, len(idxs), chunk):
                sub = idxs[c0 : c0 + chunk]
                sub_padded = self._pad_launch(sub, chunk, c0)
                scales = jnp.asarray(
                    [combos[i][1] for i in sub_padded], jnp.float32
                )
                scales, cand_keys = self._shard_candidate_axis(
                    scales, keys[jnp.asarray(sub_padded)])
                xT, eps = self._encode_skip[skip](
                    params, x0, c_ctx, uc_ctx, scales, cand_keys,
                )
                for j, i in enumerate(sub):
                    results[i] = (xT[j], eps[j])

        z_ensemble = []
        for i in range(len(combos)):
            xT, eps = results[i]
            z = jnp.concatenate([xT[None], eps], axis=0)      # (n+1, B, ...)
            z_ensemble.append(jnp.moveaxis(z, 0, 1).reshape(bsz, -1))
        return z_ensemble

    def _unflatten(self, z, skip):
        spec = self.core.spec
        bsz = z.shape[0]
        entries = (
            self.white_box_steps - skip if self.white_box_steps != -1 else 1
        )
        z = z.reshape(bsz, entries, spec.image_size, spec.image_size,
                      spec.channels)
        return z[:, 0], jnp.moveaxis(z[:, 1:], 1, 0)

    def generate(self, z_ensemble, decode_text, key) -> List[jnp.ndarray]:
        """Each z x each decoder scale -> [0,1] image (order preserved)."""
        self.core.guard_split_setting(self._sip_at_trace)
        bsz = z_ensemble[0].shape[0]
        c_ctx = self.get_condition(list(decode_text))
        uc_ctx = self.uncond(bsz)
        keys = jax.random.split(
            jnp.asarray(key), len(z_ensemble) * len(self.dec_scales)
        )

        imgs: List[Optional[jnp.ndarray]] = [None] * (
            len(z_ensemble) * len(self.dec_scales)
        )
        # replicate once per call (encode() does the same before its loop);
        # re-replicating per skip would re-broadcast the full SD param tree
        params, c_ctx_r, uc_ctx_r = self._replicated(
            self.core.params, c_ctx, uc_ctx)
        for skip in sorted(set(self.skip_steps)):
            idxs = [
                i for i in range(len(z_ensemble))
                if self.skip_steps[i % len(self.skip_steps)] == skip
            ]
            if not idxs:
                continue
            work = []  # (xT, eps, scale, flat position)
            for i in idxs:
                xT, eps = self._unflatten(z_ensemble[i], skip)
                for d, ds in enumerate(self.dec_scales):
                    work.append((xT, eps, ds, i * len(self.dec_scales) + d))
            chunk = self.candidate_chunk or len(work)
            for c0 in range(0, len(work), chunk):
                sub = work[c0 : c0 + chunk]
                n_real = len(sub)
                sub = self._pad_launch(sub, chunk, c0)
                xT_b, eps_b, scales_b, keys_b = self._shard_candidate_axis(
                    jnp.stack([w[0] for w in sub]),
                    jnp.stack([w[1] for w in sub]),
                    jnp.asarray([w[2] for w in sub], jnp.float32),
                    keys[jnp.asarray([w[3] for w in sub])],
                )
                samples = self._decode_skip[skip](
                    params, xT_b, eps_b, c_ctx_r, uc_ctx_r, scales_b, keys_b,
                )
                flat = samples.reshape((-1,) + samples.shape[2:])
                # first-stage decode in micro-batches: at 512px the VAE
                # decoder's activation working set is ~0.5GB/latent, so a
                # big candidate chunk all at once thrashes HBM (profiled:
                # the chunk-15 ensemble slowdown was this, not the UNet).
                # On a mesh the micro-batch is ext-aligned and each chunk is
                # re-sharded over ``data`` (a contiguous row slice of the
                # block-sharded candidate axis would otherwise land on one
                # device); the reshard moves ~0.5MB of latents per chunk,
                # negligible next to the decode itself.
                ext = self._data_extent
                mb = min(8 * ext, flat.shape[0])
                mb = max(ext, (mb // ext) * ext)
                parts = [
                    self._decode_jit(params, self._shard_rows(flat[i:i + mb]))
                    for i in range(0, flat.shape[0] - mb + 1, mb)
                ]
                tail = flat.shape[0] % mb
                if tail:
                    # pad the ragged tail to the micro-batch shape (one
                    # compiled program) and slice the padding back off
                    pad = jnp.concatenate(
                        [flat[-tail:], flat[-1:].repeat(mb - tail, 0)], 0)
                    parts.append(
                        self._decode_jit(params, self._shard_rows(pad))[:tail])
                decoded = jnp.concatenate(parts, axis=0)
                decoded = decoded.reshape(
                    samples.shape[:2] + decoded.shape[1:]
                )
                for j in range(n_real):
                    imgs[sub[j][3]] = (decoded[j] + 1.0) / 2.0
        return [im for im in imgs if im is not None]

    def forward(self, z_ensemble, original_img01, encode_text, decode_text,
                key):
        """Decode + DirectionalCLIP ranking -> (best image, per-sample combos).

        Parity: wrapper ``forward`` :208-247 (including the ensemble-size
        assert and the printed winning hyper-parameters).
        """
        assert self.directional_clip is not None, "ranking needs a CLIP scorer"
        img_ensemble = self.generate(z_ensemble, decode_text, key)
        assert len(img_ensemble) == (
            len(self.dec_scales) * len(self.enc_scales)
            * len(self.skip_steps) * self.n_trials
        )

        dclip = self.directional_clip
        enc_feat = dclip.text_features(list(encode_text))
        dec_feat = dclip.text_features(list(decode_text))
        orig_feat = dclip.scorer.embed_image(original_img01)

        # rank the whole ensemble with micro-batched CLIP embeddings: a few
        # large image-tower launches instead of one per candidate (the
        # reference scores candidates one by one in a Python loop, :218-235)
        n_cand = len(img_ensemble)
        stacked = jnp.stack(img_ensemble, axis=0)          # (n, B, H, W, C)
        flat = stacked.reshape((-1,) + stacked.shape[2:])
        img_feat = dclip.scorer.embed_images_microbatched(flat)
        img_feat = img_feat.reshape(n_cand, stacked.shape[1], -1)
        img_dir = img_feat - orig_feat[None]
        img_dir = img_dir / jnp.linalg.norm(img_dir, axis=-1, keepdims=True)
        text_dir = dec_feat - enc_feat
        text_dir = text_dir / jnp.linalg.norm(text_dir, axis=-1, keepdims=True)
        score_ensemble = jnp.einsum("nbz,bz->bn", img_dir, text_dir)
        best_idx = jnp.argmax(score_ensemble, axis=1)

        bsz = score_ensemble.shape[0]
        stacked = jnp.moveaxis(stacked, 0, 1)              # (B, n, H, W, C)
        img = stacked[jnp.arange(bsz), best_idx]

        # winning hyper-parameter report.  Flat candidate order is
        # trial -> enc_scale -> skip (encode(), :334-339) with dec_scale
        # innermost (generate() flat position i*D + d), so per-trial inner
        # index bi = ((e*S) + s)*D + d.  NOTE: the reference's own print
        # decodes this wrongly when |dec|>1 and |skip|>1
        # (stable_diffusion_stochastic_text_wrapper.py:236-247 swaps the
        # dec/skip strides); we return the correct tuples.
        D, S = len(self.dec_scales), len(self.skip_steps)
        n_inner = D * len(self.enc_scales) * S
        combos = []
        for b in range(bsz):
            bi = int(best_idx[b]) % n_inner
            combos.append(
                (
                    self.enc_scales[bi // (D * S)],
                    self.dec_scales[bi % D],
                    self.skip_steps[(bi // D) % S],
                )
            )
        return img, combos

    def __call__(self, z_ensemble, original_img01, encode_text, decode_text,
                 key):
        img, combos = self.forward(
            z_ensemble, original_img01, encode_text, decode_text, key
        )
        print("best scales:", combos)
        return img


def sd_stochastic_text_pipeline(core, tokenizer, dclip, **kw):
    """Factory matching SDStochasticTextWrapper's config surface."""
    assert core.spec.cond_kind == "clip"
    return StochasticTextPipeline(core, tokenizer, dclip, **kw)


def latentdiff_stochastic_text_pipeline(core, tokenizer, dclip, **kw):
    assert core.spec.cond_kind == "bert"
    return StochasticTextPipeline(core, tokenizer, dclip, **kw)
