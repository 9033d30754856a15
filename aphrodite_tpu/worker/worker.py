"""Worker: device/mesh init, model load, KV memory sizing, runner ownership.

Analog of the reference TPUWorker (aphrodite/v1/worker/tpu_worker.py:27) with
the determine_num_available_blocks handshake
(aphrodite/executor/executor_base.py:86-120) collapsed into construction:
measure free HBM after weights load, then size the paged KV cache.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.config import EngineConfig
from aphrodite_tpu.loader.weights import create_model, load_model_params
from aphrodite_tpu.parallel.mesh import build_mesh
from aphrodite_tpu.utils import logger
from aphrodite_tpu.worker.runner import ModelRunner

# Reserved activation/workspace headroom when profiling (bytes).
_ACTIVATION_HEADROOM = 1 * 2**30


def load_params_to_device(host_params, model, mesh):
    """device_put a host pytree with the model's shardings (wake path)."""
    import jax as _jax
    if mesh is None:
        return _jax.tree.map(_jax.device_put, host_params)
    from jax.sharding import NamedSharding, PartitionSpec
    from aphrodite_tpu.parallel.mesh import model_param_specs
    specs = model_param_specs(model)

    def rec(p, sp):
        if isinstance(p, dict):
            return {k: rec(v, sp.get(k) if isinstance(sp, dict) else None)
                    for k, v in p.items()}
        return _jax.device_put(
            p, NamedSharding(mesh, sp if sp is not None
                             else PartitionSpec()))
    return rec(host_params, specs)


def compile_cache_dir() -> str:
    """This host's persistent-cache directory, keyed by a CPU-feature
    fingerprint: XLA:CPU AOT results encode CPU features, and reusing
    them on a different machine can SIGILL (observed as cpu_aot_loader
    warnings when one cache dir was shared across heterogeneous hosts).
    The jax-level entries themselves are portable (TPU executables carry
    no host CPU code) — `aphrodite-tpu warmup --export/--import` ships
    them between same-TPU-generation hosts into each host's keyed dir."""
    import hashlib
    import os
    import platform
    feat = platform.machine() + platform.processor()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feat += line
                    break
    except OSError:
        pass
    tag = hashlib.sha256(feat.encode()).hexdigest()[:12]
    return os.environ.get(
        "APHRODITE_COMPILE_CACHE_DIR",
        os.path.expanduser(f"~/.cache/aphrodite_tpu/xla2-{tag}"))


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: a cold engine start compiles
    ~10 large programs at 20-40 s each on a tunneled TPU; the disk cache
    drops warm restarts to seconds (the reference relies on torch-xla's
    XLA_CACHE_DIR the same way, ref: v1/worker/tpu_worker.py env handling).
    Opt out with APHRODITE_DISABLE_COMPILE_CACHE=1."""
    import os
    if os.environ.get("APHRODITE_DISABLE_COMPILE_CACHE") == "1":
        return
    try:
        path = compile_cache_dir()
        os.makedirs(path, exist_ok=True)
        prev = jax.config.jax_compilation_cache_dir
        jax.config.update("jax_compilation_cache_dir", path)
        if prev is not None and prev != path:
            # jax's compilation cache latches its directory on first use;
            # honor a changed APHRODITE_COMPILE_CACHE_DIR mid-process.
            try:
                from jax._src import compilation_cache as _cc
                _cc.reset_cache()
            except Exception:
                pass
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(os.environ.get(
                              "APHRODITE_CACHE_MIN_COMPILE_SECS", "1.0")))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        try:
            # XLA:CPU AOT executables embed the COMPILE machine's CPU
            # features; under a remote-compile helper (tunneled TPU
            # setups) that machine differs from this host, so reloading
            # them risks SIGILL. Keep only the portable jax-level entries.
            jax.config.update("jax_persistent_cache_enable_xla_caches",
                              "none")
        except Exception:
            pass  # older jax: option absent
    except Exception as e:  # cache is best-effort
        logger.debug("compilation cache unavailable: %s", e)


class Worker:

    def __init__(self, config: EngineConfig) -> None:
        self.config = config
        _enable_compile_cache()
        if config.device_config.device == "cpu":
            # Make an explicit --device cpu authoritative even when a TPU
            # plugin (e.g. axon sitecustomize) pre-selected itself.
            try:
                jax.config.update("jax_platforms", "cpu")
            except Exception:
                pass
        self.device_kind = config.device_config.resolve()
        pc = config.parallel_config
        self.mesh = (build_mesh(pc) if pc.world_size > 1 else None)

        self.model = create_model(config.model_config)
        self.model.mesh = self.mesh
        if pc.sequence_parallel:
            self.model.sequence_parallel = True
        if pc.pipeline_parallel_size > 1:
            if self.model.num_layers % pc.pipeline_parallel_size:
                raise ValueError(
                    f"num_layers={self.model.num_layers} not divisible by "
                    f"pipeline_parallel_size={pc.pipeline_parallel_size}")
            self.model.pp_size = pc.pipeline_parallel_size
            self.model.mesh = self.mesh
        if pc.enable_expert_parallel:
            # EP shards the expert dim of MoE weights across the tp axis
            # (reference: fused_moe/layer.py:432 routes experts across TP
            # ranks); the model switches its MoE math to the einsum form so
            # GSPMD partitions over experts and all-reduces the combine.
            self.model.expert_parallel = True
        from aphrodite_tpu.quantization.base import get_quantization_config
        self.quant_config = get_quantization_config(config.model_config)
        if self.quant_config is not None and \
                self.quant_config.method != "dequant":
            self.model.set_quant_config(self.quant_config)
            logger.info("quantization: %s (bits=%d group=%d)",
                        self.quant_config.method,
                        self.quant_config.weight_bits,
                        self.quant_config.group_size)
        self.params = load_model_params(
            self.model, config.model_config, config.load_config,
            mesh=self.mesh, rng_seed=config.model_config.seed,
            quant_config=self.quant_config)
        if config.lora_config is None and \
                hasattr(self.model, "maybe_merge_params"):
            # Fused QKV / gate-up GEMMs (decode weight streaming); LoRA
            # keeps split projections (adapters target them individually).
            self.params = self.model.maybe_merge_params(self.params)

        if getattr(self.model, "is_encoder", False):
            # Encoder/embedding models: no paged KV, no decode runner.
            from aphrodite_tpu.worker.encoder_runner import EncoderRunner
            self.lora_manager = None
            self.runner = EncoderRunner(config, self.model, self.params)
            config.cache_config.num_blocks = config.cache_config.num_blocks \
                or 2
            return

        cc = config.cache_config
        if cc.num_blocks is None:
            if cc.num_blocks_override is not None:
                cc.num_blocks = cc.num_blocks_override
            else:
                cc.num_blocks = self._determine_num_blocks()
        logger.info("KV pages: %d x %d tokens", cc.num_blocks, cc.block_size)

        self.lora_manager = None
        if config.lora_config is not None:
            from aphrodite_tpu.lora import LoRAManager
            from aphrodite_tpu.utils import jax_dtype
            self.lora_manager = LoRAManager(
                self.model, config.lora_config.max_loras,
                config.lora_config.max_lora_rank,
                dtype=jax_dtype(config.lora_config.lora_dtype
                                if config.model_config.dtype != "float32"
                                else "float32"))

        if getattr(self.model, "is_ssm", False):
            # Recurrent-state models have no reusable KV pages: computed
            # prefixes cannot be "hit" (reference: attention-free models
            # force-disable prefix caching, platforms/interface.py).
            config.cache_config.enable_prefix_caching = False

        self.runner = ModelRunner(config, self.model, self.params,
                                  mesh=self.mesh,
                                  lora_manager=self.lora_manager)

        sc = config.speculative_config
        if sc is not None and sc.method == "draft_model" \
                and sc.num_speculative_tokens > 0:
            from aphrodite_tpu.config import ModelConfig
            from aphrodite_tpu.spec_decode.draft_model import \
                DraftModelRunner
            dmc = ModelConfig(
                model=sc.draft_model, tokenizer="unused",
                dtype=config.model_config.dtype,
                max_model_len=config.model_config.max_model_len,
                trust_remote_code=config.model_config.trust_remote_code)
            dmodel = create_model(dmc)
            dmodel.mesh = self.mesh
            dparams = load_model_params(
                dmodel, dmc, config.load_config, mesh=self.mesh,
                rng_seed=config.model_config.seed)
            self.runner.draft = DraftModelRunner(config, dmodel, dparams,
                                                 self.runner)
            logger.info("draft model for speculative decoding: %s "
                        "(%d layers)", sc.draft_model, dmodel.num_layers)
        elif sc is not None and sc.method == "eagle" \
                and sc.num_speculative_tokens > 0:
            import jax as _jax
            from aphrodite_tpu.loader.weights import weights_iterator
            from aphrodite_tpu.spec_decode.eagle import (EagleDraftHead,
                                                         EagleProposer)
            head = EagleDraftHead(self.model)
            if sc.draft_model and config.load_config.load_format != "dummy":
                eparams = head.load_weights(
                    weights_iterator(sc.draft_model))
            else:
                eparams = head.init_dummy_params(
                    _jax.random.PRNGKey(config.model_config.seed + 1))
            eparams = _jax.tree.map(_jax.device_put, eparams)
            self.runner.draft = EagleProposer(config, head, eparams,
                                              self.runner, self.params)
            logger.info("EAGLE draft head for speculative decoding "
                        "(k=%d)", sc.num_speculative_tokens)
        elif sc is not None and sc.method == "deepseek_mtp" \
                and sc.num_speculative_tokens > 0:
            import jax as _jax
            from aphrodite_tpu.loader.weights import weights_iterator
            from aphrodite_tpu.spec_decode.eagle import EagleProposer
            from aphrodite_tpu.spec_decode.mtp import DeepseekMTPHead
            head = DeepseekMTPHead(self.model)
            if sc.draft_model and config.load_config.load_format != "dummy":
                mparams = head.load_weights(
                    weights_iterator(sc.draft_model))
            else:
                mparams = head.init_dummy_params(
                    _jax.random.PRNGKey(config.model_config.seed + 1))
            mparams = _jax.tree.map(_jax.device_put, mparams)
            head.bind_head(mparams)
            self.runner.draft = EagleProposer(config, head, mparams,
                                              self.runner, self.params)
            logger.info("DeepSeek-MTP draft head for speculative decoding "
                        "(k=%d)", sc.num_speculative_tokens)
        elif sc is not None and sc.method in ("medusa", "mlp_speculator") \
                and sc.num_speculative_tokens > 0:
            from aphrodite_tpu.spec_decode.heads import (
                MedusaProposer, MLPSpeculatorProposer)
            cls = MedusaProposer if sc.method == "medusa" \
                else MLPSpeculatorProposer
            self.runner.draft = cls(config, self.runner, sc.draft_model)

    # ----------------------------------------------------------------- LoRA
    def add_lora(self, name: str, path: str) -> int:
        if self.lora_manager is None:
            raise ValueError("LoRA is not enabled (pass enable_lora=True)")
        return self.lora_manager.add_lora(name, path)

    def remove_lora(self, name: str) -> bool:
        if self.lora_manager is None:
            return False
        return self.lora_manager.remove_lora(name)

    def list_loras(self) -> list[str]:
        return self.lora_manager.list_loras() if self.lora_manager else []

    def _determine_num_blocks(self) -> int:
        """Size the KV pool from device memory stats (the reference's
        dummy-run + mem_get_info math, worker/tpu_worker.py:137)."""
        cc = self.config.cache_config
        mc = self.config.model_config
        page_bytes = (mc.num_kv_heads * 2 * mc.head_dim * cc.block_size *
                      mc.num_layers *
                      (1 if cc.cache_dtype.startswith("fp8") else
                       jnp.dtype(mc.dtype).itemsize))
        tp = self.config.parallel_config.tensor_parallel_size
        page_bytes = max(page_bytes // tp, 1)
        try:
            stats = jax.devices()[0].memory_stats()
            limit = stats.get("bytes_limit", 0)
            in_use = stats.get("bytes_in_use", 0)
        except Exception:
            limit = 0
        if not limit and self.device_kind == "tpu":
            # Some PJRT plugins (e.g. tunneled devices) report no memory
            # stats. Estimate: HBM by device generation, in-use = loaded
            # parameter bytes (undersizing the pool causes preemption storms
            # on full batches — see bench notes).
            kind = getattr(jax.devices()[0], "device_kind", "").lower()
            hbm_by_kind = {"v5 lite": 16, "v5e": 16, "v6 lite": 32,
                           "v6e": 32, "v4": 32, "v5p": 95, "v5": 95}
            gib = next((g for k, g in hbm_by_kind.items() if k in kind), 16)
            limit = gib * 2**30
            in_use = sum(
                np.prod(leaf.shape) * jnp.dtype(leaf.dtype).itemsize
                for leaf in jax.tree.leaves(self.params))
        if not limit:
            # CPU or unknown platform: small default for tests.
            return 512
        budget = int(limit * cc.hbm_utilization) - in_use \
            - _ACTIVATION_HEADROOM
        # Multimodal models keep a device-resident encoder-output cache
        # (worker/encoder_cache.py) that grows to its budget in steady
        # state: carve it out of the pool so it cannot OOM mid-serving.
        # Non-MM models never insert (content_hash key is None).
        if any(getattr(self.model, enc, None) is not None
               for enc in ("encode_images", "encode_media",
                           "encode_audio")):
            budget -= (self.config.tpu_config.encoder_cache_budget_mb
                       * 1024 * 1024)
        num = max(budget // page_bytes, 16)
        max_needed = (self.config.max_blocks_per_req *
                      self.config.scheduler_config.max_num_seqs + 1)
        return int(min(num, max_needed))

    def execute_model(self, scheduler_output):
        return self.runner.execute_model(scheduler_output)

    # ---------------------------------------------------------- sleep / wake
    # Reference: cumem-based sleep levels (device_allocator/cumem.py,
    # executor_base.py:197-232). TPU-native: level 1 frees the KV cache HBM;
    # level 2 additionally offloads weights to host RAM via device_get.
    def sleep(self, level: int = 1) -> None:
        import jax.numpy as jnp
        if self.runner.kv_cache is not None:
            self._kv_shape = self.runner.kv_cache.shape
            self._kv_dtype = self.runner.kv_cache.dtype
            self.runner.kv_cache = None
        if level >= 2 and not getattr(self, "_params_on_host", False):
            self.params = jax.device_get(self.params)
            self.runner.params = None
            self._params_on_host = True
        self.sleeping = True
        logger.info("worker asleep (level %d)", level)

    def wake_up(self) -> None:
        import jax.numpy as jnp
        if getattr(self, "_params_on_host", False):
            self.params = load_params_to_device(
                self.params, self.model, self.mesh)
            self.runner.params = self.params
            self._params_on_host = False
        if self.runner.kv_cache is None:
            self.runner.kv_cache = jnp.zeros(self._kv_shape, self._kv_dtype)
        self.sleeping = False
        logger.info("worker awake")

    @property
    def is_sleeping(self) -> bool:
        return getattr(self, "sleeping", False)

    def get_is_sleeping(self) -> bool:
        return self.is_sleeping

    def embed(self, token_lists, pooling: str = "last"):
        out = self.runner.embed(token_lists, pooling=pooling)
        import numpy as np
        return [np.asarray(v).tolist() for v in out]

    def score(self, pairs):
        return self.runner.score(pairs)

    # ------------------------------------------------------------- profiling
    def start_profile(self, out_dir: str = "/tmp/aphrodite_tpu_profile"
                      ) -> None:
        jax.profiler.start_trace(out_dir)
        logger.info("profiler started -> %s", out_dir)

    def stop_profile(self) -> None:
        jax.profiler.stop_trace()
        logger.info("profiler stopped")
