"""LatentDiffusion core (UNet + first stage + cond stage) and the
unconditional stochastic latent pipeline (FFHQ -> CelebA-HQ).

Core parity with ``ldm/models/diffusion/ddpm.py``: ``encode_first_stage`` /
``get_first_stage_encoding`` (:536-543, sampling the KL posterior x
scale_factor — part of the latent code's randomness), ``decode_first_stage``
(:698), ``get_learned_conditioning`` (:545-556), ``apply_model`` (:882-983,
crossattn routing).  Pipeline parity with
``model/gan_wrapper/latentdiff_stochastic_wrapper.py:185-316``:
``latent_dim = image_size^2 * channels * white_box_steps`` (:227), generate =
``sample_with_eps`` + optional eta=1 ``refine`` (:56-79), class-conditional
branch plumbed (NotImplementedError, as in the reference :236).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from cyclediffusion_tpu.models.autoencoder import (
    AutoencoderKL,
    DDConfig,
    DiagonalGaussian,
    VQModel,
)
from cyclediffusion_tpu.models.text_encoders import (
    CLIPTextConfig,
    CLIPTextEncoder,
    LDMBertConfig,
    LDMBertEncoder,
)
from cyclediffusion_tpu.models.unet_gd import GDUNet, GDUNetConfig
from cyclediffusion_tpu.ops import schedule
from cyclediffusion_tpu.ops.fold import SplitInputParams, split_first_stage_apply
from cyclediffusion_tpu.samplers import (
    ddim_decode,
    ddim_decode_cached,
    ddim_refine,
    dpm_encode,
    dpm_encode_cached,
)


@dataclasses.dataclass(frozen=True)
class LatentCoreSpec:
    """One latent diffusion model: UNet + first stage + optional cond stage."""

    name: str
    unet: GDUNetConfig
    first_stage: DDConfig
    fs_kind: str                   # 'kl' | 'vq'
    embed_dim: int
    scale_factor: float
    linear_start: float
    linear_end: float
    num_timesteps: int = 1000
    n_embed: int = 8192            # vq codebook size
    cond_kind: Optional[str] = None  # None | 'clip' | 'bert'
    cond_cfg: Optional[object] = None
    resolution: int = 256          # pixel-space resolution

    @property
    def image_size(self) -> int:
        """Latent spatial size (reference ``generator.image_size``)."""
        return self.resolution // 2 ** (len(self.first_stage.ch_mult) - 1)

    @property
    def channels(self) -> int:
        return self.unet.in_channels

    # ---- presets (reference yaml configs) ------------------------------ #

    @staticmethod
    def sd_v1() -> "LatentCoreSpec":
        return LatentCoreSpec(
            name="sd_v1", unet=GDUNetConfig.sd_v1(), first_stage=DDConfig.sd_f8(),
            fs_kind="kl", embed_dim=4, scale_factor=0.18215,
            linear_start=0.00085, linear_end=0.0120,
            cond_kind="clip", cond_cfg=CLIPTextConfig.vit_l_14(), resolution=512,
        )

    @staticmethod
    def ldm_text2img_large() -> "LatentCoreSpec":
        return LatentCoreSpec(
            name="ldm_text2img_large", unet=GDUNetConfig.ldm_text2img_large(),
            first_stage=DDConfig.sd_f8(), fs_kind="kl", embed_dim=4,
            scale_factor=0.18215, linear_start=0.00085, linear_end=0.012,
            cond_kind="bert", cond_cfg=LDMBertConfig.text2img_large(),
            resolution=256,
        )

    @staticmethod
    def ldm_ffhq256() -> "LatentCoreSpec":
        return LatentCoreSpec(
            name="ldm_ffhq256", unet=GDUNetConfig.ldm_ffhq256(),
            first_stage=DDConfig.vq_f4(), fs_kind="vq", embed_dim=3,
            scale_factor=1.0, linear_start=0.0015, linear_end=0.0195,
            resolution=256,
        )

    @staticmethod
    def ldm_celeba256() -> "LatentCoreSpec":
        return dataclasses.replace(
            LatentCoreSpec.ldm_ffhq256(), name="ldm_celeba256"
        )

    @staticmethod
    def from_yaml(path: str, name: Optional[str] = None) -> "LatentCoreSpec":
        """Build a spec from a reference LatentDiffusion yaml (the OmegaConf
        files under ``configs/`` / ``models/ldm/*/config.yaml``)."""
        import yaml

        cfg = yaml.safe_load(open(path))["model"]["params"]
        u = cfg["unet_config"]["params"]
        unet = GDUNetConfig(
            in_channels=u["in_channels"],
            model_channels=u["model_channels"],
            out_channels=u["out_channels"],
            num_res_blocks=u["num_res_blocks"],
            attention_resolutions=tuple(u["attention_resolutions"]),
            channel_mult=tuple(u["channel_mult"]),
            num_heads=u.get("num_heads", -1),
            num_head_channels=u.get("num_head_channels", -1),
            use_spatial_transformer=u.get("use_spatial_transformer", False),
            transformer_depth=u.get("transformer_depth", 1),
            context_dim=u.get("context_dim"),
            legacy=u.get("legacy", True),
        )
        fs = cfg["first_stage_config"]
        dd = fs["params"]["ddconfig"]
        first_stage = DDConfig(
            ch=dd["ch"], out_ch=dd["out_ch"], ch_mult=tuple(dd["ch_mult"]),
            num_res_blocks=dd["num_res_blocks"],
            attn_resolutions=tuple(dd.get("attn_resolutions", ())),
            in_channels=dd["in_channels"], resolution=dd["resolution"],
            z_channels=dd["z_channels"], double_z=dd.get("double_z", False),
        )
        fs_kind = "kl" if "AutoencoderKL" in fs["target"] else "vq"
        cond_kind = None
        cond_cfg = None
        cs = cfg.get("cond_stage_config")
        if isinstance(cs, dict):
            target = cs.get("target", "")
            if "CLIP" in target:
                cond_kind, cond_cfg = "clip", CLIPTextConfig.vit_l_14()
            elif "BERT" in target:
                p = cs.get("params", {})
                cond_kind = "bert"
                cond_cfg = LDMBertConfig(
                    dim=p.get("n_embed", 1280), depth=p.get("n_layer", 32)
                )
        return LatentCoreSpec(
            name=name or "from_yaml", unet=unet, first_stage=first_stage,
            fs_kind=fs_kind, embed_dim=fs["params"]["embed_dim"],
            scale_factor=cfg.get("scale_factor", 1.0),
            linear_start=cfg["linear_start"], linear_end=cfg["linear_end"],
            num_timesteps=cfg.get("timesteps", 1000),
            n_embed=fs["params"].get("n_embed", 8192),
            cond_kind=cond_kind, cond_cfg=cond_cfg,
            resolution=dd["resolution"],
        )

    @staticmethod
    def tiny(cond_kind: Optional[str] = "clip", resolution: int = 32,
             fs_kind: str = "kl") -> "LatentCoreSpec":
        """CPU-runnable miniature (latent 8x8) for tests/smoke benches.

        ``fs_kind='vq'`` miniaturizes the FFHQ/CelebA first stage instead
        (VQModelInterface: double_z=False, codebook quantization on decode,
        scale_factor 1 — ffhq-ldm-vq-4.yaml)."""
        cond_cfg = None
        context_dim = None
        if cond_kind == "clip":
            cond_cfg = CLIPTextConfig(vocab_size=96, hidden_size=24,
                                      num_layers=2, num_heads=4,
                                      max_positions=16, intermediate_size=48)
            context_dim = 24
        elif cond_kind == "bert":
            cond_cfg = LDMBertConfig(vocab_size=96, dim=24, depth=2, heads=2,
                                     dim_head=12, max_seq_len=16)
            context_dim = 24
        return LatentCoreSpec(
            name=f"tiny_latent_{cond_kind}_{fs_kind}",
            unet=GDUNetConfig(
                in_channels=4, model_channels=32, out_channels=4,
                num_res_blocks=1, attention_resolutions=(1, 2),
                channel_mult=(1, 2), num_heads=4,
                use_spatial_transformer=cond_kind is not None,
                context_dim=context_dim, legacy=False,
            ),
            first_stage=DDConfig(ch=16, ch_mult=(1, 2, 4), num_res_blocks=1,
                                 resolution=resolution, z_channels=4,
                                 double_z=(fs_kind == "kl"),
                                 attn_resolutions=()),
            fs_kind=fs_kind, embed_dim=4, n_embed=64,
            scale_factor=0.18215 if fs_kind == "kl" else 1.0,
            linear_start=0.00085, linear_end=0.012, num_timesteps=100,
            cond_kind=cond_kind, cond_cfg=cond_cfg, resolution=resolution,
        )


class LatentDiffusionCore:
    """Param-holding assembly with jit-friendly pure methods."""

    def __init__(self, spec: LatentCoreSpec, params: dict, dtype=jnp.float32):
        self.spec = spec
        self.params = params
        self.dtype = dtype
        # tiled first-stage inference for large inputs, mirroring
        # `model.split_input_params = {...}` / `delattr`
        # (notebook_helpers.py:149-165).  See ops/fold.py.  NOTE: the flag
        # is read at TRACE time — set it before jitting/compiling a caller
        # (a jitted program replayed from cache keeps whatever setting it
        # was traced with; the eager reference toggles at will, jit cannot).
        self.split_input_params = None

        self.unet = GDUNet(spec.unet, dtype=dtype)
        if spec.fs_kind == "kl":
            self.first_stage = AutoencoderKL(spec.first_stage, spec.embed_dim,
                                             dtype=dtype)
        else:
            self.first_stage = VQModel(spec.first_stage, n_embed=spec.n_embed,
                                       embed_dim=spec.embed_dim, dtype=dtype)
        if spec.cond_kind == "clip":
            self.cond_model = CLIPTextEncoder(spec.cond_cfg, dtype=dtype)
        elif spec.cond_kind == "bert":
            self.cond_model = LDMBertEncoder(spec.cond_cfg, dtype=dtype)
        else:
            self.cond_model = None

    # ---- constructors -------------------------------------------------- #

    @classmethod
    def from_torch_ckpt(cls, spec: LatentCoreSpec, ckpt_path: str,
                        use_ema: bool = False, **kw):
        from cyclediffusion_tpu.convert import (
            convert_clip_text,
            convert_gd_unet,
            convert_ldm_bert,
            convert_vae,
            load_torch_state_dict,
            split_latent_diffusion_state,
        )

        sd = load_torch_state_dict(ckpt_path)
        unet_sd, fs_sd, cond_sd = split_latent_diffusion_state(sd, use_ema)
        params = {
            "unet": convert_gd_unet(unet_sd),
            "first_stage": convert_vae(fs_sd),
        }
        if spec.cond_kind == "clip":
            params["cond"] = convert_clip_text(cond_sd)
        elif spec.cond_kind == "bert":
            params["cond"] = convert_ldm_bert(cond_sd)
        return cls(spec, params, **kw)

    @classmethod
    def random_init(cls, spec: LatentCoreSpec, key: jax.Array, **kw):
        # every .init below is jitted: unjitted Flax init dispatches each
        # primitive as its own tiny program, and on this image's tunneled
        # TPU runtime the per-program remote compiles cost ~10 min for the
        # SD core on a fresh process (measured — the round-2 bench-extras
        # stall).  One jitted init per submodule compiles once and replays
        # from the persistent cache.
        k1, k2, k3 = jax.random.split(key, 3)
        latent = jnp.zeros(
            (1, spec.image_size, spec.image_size, spec.channels)
        )
        t = jnp.zeros((1,), jnp.int32)
        core = cls(spec, {}, **kw)
        ctx = None
        cond_params = None
        if core.cond_model is not None:
            ids = jnp.zeros((1, 8), jnp.int32)
            cond_params = jax.jit(core.cond_model.init)(k3, ids)
            ctx_dim = spec.unet.context_dim
            ctx = jnp.zeros((1, 8, ctx_dim))
        img = jnp.zeros((1, spec.resolution, spec.resolution, 3))
        if spec.fs_kind == "kl":
            noise = jnp.zeros_like(latent)
            fs_params = jax.jit(core.first_stage.init)(k2, img, noise)
        else:
            fs_params = jax.jit(core.first_stage.init)(k2, img)
        params = {
            "unet": jax.jit(core.unet.init)(k1, latent, t, ctx),
            "first_stage": fs_params,
        }
        if cond_params is not None:
            params["cond"] = cond_params
        core.params = params
        return core

    # ---- reference core surface ---------------------------------------- #
    #
    # All methods take an optional explicit ``params`` tree.  Jitted callers
    # MUST pass it as a traced argument: relying on the ``self.params``
    # default inside jit bakes the full weight set into the compiled program
    # as constants (hundreds of MB for SD — and it overflows this image's
    # remote-compile transport).

    def apply_model(self, x, t, context=None, params=None):
        params = self.params if params is None else params
        return self.unet.apply(params["unet"], x, t, context)

    def apply_model_cached(self, x, t, context=None, encoder_cache=None,
                           params=None):
        """UNet call exposing the encoder-feature cache (fast mode):
        returns ``(eps, cache)``; pass the cache back to skip the encoder."""
        params = self.params if params is None else params
        return self.unet.apply(params["unet"], x, t, context,
                               encoder_cache=encoder_cache, return_cache=True)

    def get_learned_conditioning(self, token_ids, params=None):
        assert self.cond_model is not None
        params = self.params if params is None else params
        return self.cond_model.apply(params["cond"], jnp.asarray(token_ids))

    @property
    def _vqf(self) -> int:
        """First-stage spatial factor (2^(levels-1)); the reference passes it
        in as split_input_params['vqf']."""
        return 2 ** (len(self.spec.first_stage.ch_mult) - 1)

    def _split_scale(self, sip) -> int:
        """Honor an explicit ``vqf`` (the reference always sets one,
        notebook_helpers.py:153-160); default to the model-derived factor."""
        return self._vqf if sip.vqf is None else sip.vqf

    def guard_split_setting(self, traced) -> None:
        """Raise if ``split_input_params`` changed after ``traced`` was
        captured: jitted callers bake the setting at trace time, so a later
        toggle would be SILENTLY ignored for already-compiled shapes.
        Pipelines capture the value at construction and call this on entry."""
        if self.split_input_params != traced:
            raise RuntimeError(
                "core.split_input_params changed after the pipeline's jitted "
                "programs were traced (set it before constructing the "
                f"pipeline): traced={traced!r}, now={self.split_input_params!r}"
            )

    def encode_first_stage(self, image_m11, noise=None, params=None):
        """[-1,1] image -> x0 latent (KL: posterior sample x scale_factor).

        With ``split_input_params`` set, the image is encoded in overlapping
        ``ks`` tiles blended by border weighting (ddpm.py:817-849).  The
        reference's split encode only survives VQ first stages (it stacks
        raw ``encode`` outputs, which for KL are posterior objects); here the
        KL case tiles the MOMENTS and samples the stitched posterior, so
        both kinds work.
        """
        params = self.params if params is None else params
        sip = self.split_input_params
        if self.spec.fs_kind == "kl":
            enc = lambda img: self.first_stage.apply(
                params["first_stage"], img,
                method=self.first_stage.encode_moments,
            )
            if sip is not None and sip.patch_distributed_vq:
                moments = split_first_stage_apply(
                    enc, image_m11, sip, scale=self._split_scale(sip),
                    upsample=False)
            else:
                moments = enc(image_m11)
            posterior = DiagonalGaussian(moments)
            assert noise is not None, "KL first stage sampling needs noise"
            z = posterior.sample(noise)
        else:
            enc = lambda img: self.first_stage.apply(
                params["first_stage"], img, method=self.first_stage.encode,
            )
            if sip is not None and sip.patch_distributed_vq:
                z = split_first_stage_apply(
                    enc, image_m11, sip, scale=self._split_scale(sip),
                    upsample=False)
            else:
                z = enc(image_m11)
        return z * self.spec.scale_factor

    def decode_first_stage(self, z, params=None):
        """Latent -> [-1,1] image; tiled overlap-blended decode when
        ``split_input_params`` is set (ddpm.py:698-745, patches batched into
        ONE VAE call instead of the reference's per-patch Python loop)."""
        params = self.params if params is None else params
        z = z / self.spec.scale_factor
        dec = lambda zz: self.first_stage.apply(
            params["first_stage"], zz, method=self.first_stage.decode
        )
        sip = self.split_input_params
        if sip is not None and sip.patch_distributed_vq:
            return split_first_stage_apply(
                dec, z, sip, scale=self._split_scale(sip), upsample=True)
        return dec(z)

    def make_ddim_schedule(self, custom_steps: int, eta: float):
        betas = schedule.make_beta_schedule(
            "linear", self.spec.num_timesteps,
            linear_start=self.spec.linear_start,
            linear_end=self.spec.linear_end,
        )
        return schedule.DDIMSchedule.create(betas, custom_steps, eta)


class LatentDiffStochasticPipeline:
    """Unconditional latent DPM-Encoder pipeline (FFHQ/CelebA-HQ)."""

    def __init__(
        self,
        core: LatentDiffusionCore,
        *,
        custom_steps: int,
        eta: float,
        white_box_steps: int,
        refine_steps: int = 0,
        enforce_class_input: Optional[bool] = None,
        unconditional_guidance_scale: Optional[float] = None,
        fast_key_every: Optional[int] = None,
    ):
        if enforce_class_input:
            raise NotImplementedError(
                "class-conditional latent sampling is plumbed but not "
                "implemented, as in the reference (:236)"
            )
        assert eta > 0
        self.core = core
        self.custom_steps = custom_steps
        self.eta = eta
        self.white_box_steps = white_box_steps
        self.refine_steps = refine_steps
        # opt-in encoder-caching fast mode (Faster Diffusion) on both
        # chains; OFF the fixed-seed parity path (see PARITY_r2.json)
        self.fast_key_every = fast_key_every
        self.sched = core.make_ddim_schedule(custom_steps, eta)
        assert white_box_steps <= custom_steps + 1

        spec = core.spec
        self.resolution = spec.resolution
        self.latent_dim = spec.image_size**2 * spec.channels * white_box_steps

        self._encode_jit = jax.jit(self._encode_impl)
        self._generate_jit = jax.jit(self._generate_impl)
        self._sip_at_trace = core.split_input_params

    def _cached_fns(self, params):
        """(key_fn, reuse_fn) for the unconditional cached UNet call."""
        def key_fn(x, t):
            return self.core.apply_model_cached(x, t, None, params=params)

        def reuse_fn(x, t, cache):
            return self.core.apply_model_cached(
                x, t, None, encoder_cache=cache, params=params)[0]

        return key_fn, reuse_fn

    def _encode_impl(self, params, image01, key):
        spec = self.core.spec
        model_fn = lambda x, t: self.core.apply_model(x, t, None, params)
        image = (image01 - 0.5) * 2.0
        k_vae, k_chain = jax.random.split(key)
        if spec.fs_kind == "kl":
            noise = jax.random.normal(
                k_vae,
                (image.shape[0], spec.image_size, spec.image_size,
                 spec.embed_dim),
            )
            x0 = self.core.encode_first_stage(image, noise, params)
        else:
            x0 = self.core.encode_first_stage(image, params=params)
        if self.fast_key_every and self.fast_key_every > 1:
            key_fn, reuse_fn = self._cached_fns(params)
            xT, eps = dpm_encode_cached(
                key_fn, reuse_fn, self.sched, x0, k_chain,
                white_box_steps=self.white_box_steps,
                key_every=self.fast_key_every,
            )
        else:
            xT, eps = dpm_encode(
                model_fn, self.sched, x0, k_chain,
                white_box_steps=self.white_box_steps,
            )
        b = x0.shape[0]
        z = jnp.concatenate([xT[None], eps], axis=0)
        return jnp.moveaxis(z, 0, 1).reshape(b, -1)

    def _generate_impl(self, params, z, key):
        spec = self.core.spec
        model_fn = lambda x, t: self.core.apply_model(x, t, None, params)
        b = z.shape[0]
        z = z.reshape(b, self.white_box_steps, spec.image_size,
                      spec.image_size, spec.channels)
        xT = z[:, 0]
        eps = jnp.moveaxis(z[:, 1:], 1, 0)
        k_decode, k_refine = jax.random.split(key)
        if self.fast_key_every and self.fast_key_every > 1:
            key_fn, reuse_fn = self._cached_fns(params)
            sample = ddim_decode_cached(
                key_fn, reuse_fn, self.sched, xT, eps, k_decode,
                key_every=self.fast_key_every,
            )
        else:
            sample = ddim_decode(model_fn, self.sched, xT, eps, k_decode)
        if self.refine_steps > 0:
            sample = ddim_refine(
                model_fn, self.sched, sample, k_refine,
                refine_steps=self.refine_steps,
            )
        return self.core.decode_first_stage(sample, params)

    # ---- public protocol ------------------------------------------------ #

    def encode(self, image01, key, class_label=None):
        assert image01.shape[1] == image01.shape[2] == self.resolution
        self.core.guard_split_setting(self._sip_at_trace)
        z = self._encode_jit(self.core.params, image01, key)
        assert z.shape[1] == self.latent_dim
        return z

    def generate(self, z, key, class_label=None):
        self.core.guard_split_setting(self._sip_at_trace)
        return self._generate_jit(self.core.params, z, key)

    def __call__(self, z, key, class_label=None):
        return (self.generate(z, key) + 1.0) / 2.0
