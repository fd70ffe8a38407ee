"""End-to-end Spark-TTS pipeline: the public API.

Parity target: reference `cli/SparkTTS.py:27-236` — `inference(text,
prompt_speech_path, prompt_text, gender, pitch, speed, temperature, top_k,
top_p)` → 16 kHz waveform, supporting zero-shot voice cloning (prompt wav) and
controllable voice creation (gender/pitch/speed, LLM emits the global tokens,
reference `cli/SparkTTS.py:222-228`).

TPU-shaped differences from the reference (behavior-preserving):
  * audio-token ↔ LLM-token conversion is id arithmetic, not text+regex
  * every device program is jitted with shape bucketing (padded wav / padded
    token sequences, cropped on the way out) so repeat calls hit the XLA
    compile cache instead of recompiling per length
  * the whole generate loop (prefill + decode + sampling + EOS) is one XLA
    program (`lm/generate.py`)
"""

from __future__ import annotations

import hashlib
import logging
import os
import threading
from collections import OrderedDict
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sparktts_tpu import checkpoint as CKPT
from sparktts_tpu.codec.bicodec import bicodec_detokenize, bicodec_tokenize, init_bicodec
from sparktts_tpu.config import SparkTTSConfig, load_spark_config, tiny_test_config
from sparktts_tpu.io.audio import get_ref_clip, load_audio
from sparktts_tpu.lm.generate import generate
from sparktts_tpu.lm.qwen import init_qwen
from sparktts_tpu.nn.wav2vec2 import (
    feature_lengths,
    init_wav2vec2,
    normalize_input,
    wav2vec2_features,
)
from sparktts_tpu.utils.profiling import stage
from sparktts_tpu.prompt import (
    HFSparkTokenizer,
    SparkTokenizerBase,
    SyntheticSparkTokenizer,
    build_clone_prompt,
    build_control_prompt,
    extract_global_ids,
    extract_semantic_ids,
)

logger = logging.getLogger(__name__)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _seed_rng(seed, b: int) -> jax.Array:
    """Sampling key(s) for a batch of `b` rows.

    An int seed keeps the classic single-key stream (one gumbel draw over
    the whole batch).  A sequence of per-row seeds builds a (B, 2) raw key
    batch: each row's sample stream then depends only on its own seed, so
    requests with different seeds can share ONE compiled generate program
    (the serving window no longer splits by seed) and a row's output is
    invariant to batch composition."""
    if np.isscalar(seed) or isinstance(seed, (int, np.integer)):
        return jax.random.PRNGKey(int(seed))
    seeds = np.asarray(list(seed), np.uint32)
    if len(seeds) != b:
        raise ValueError(f"got {len(seeds)} seeds for batch of {b}")
    # one jitted vmapped seeding — no per-seed host/device round-trips
    return _batch_keys(jnp.asarray(seeds))


# module-level so the jit executable cache persists across calls (a fresh
# jax.jit(jax.vmap(...)) wrapper per call would retrace+recompile every
# serving window — a remote compile round-trip per request on a relay TPU)
_batch_keys = jax.jit(jax.vmap(jax.random.PRNGKey))


class SparkTTSPipeline:
    """Drop-in equivalent of the reference `SparkTTS` class."""

    def __init__(
        self,
        model_dir: Optional[str | Path] = None,
        config: Optional[SparkTTSConfig] = None,
        seed: int = 0,
        lm_dtype=jnp.bfloat16,
        prompt_bucket: int = 64,
        wav_bucket_s: float = 1.0,
        max_new_tokens: Optional[int] = None,
        use_flash: Optional[bool] = None,
        guided: bool = True,
        speculative_k: int = 0,
        draft_layers: int = 6,
        codec_device=None,
        voice_cache_size: int = 0,
    ):
        if model_dir is not None:
            self.config = load_spark_config(model_dir)
            self.tokenizer: SparkTokenizerBase = HFSparkTokenizer(
                model_dir,
                n_semantic=self.config.bicodec.quantizer.codebook_size,
                n_global=int(np.prod(self.config.bicodec.speaker_encoder.fsq_levels)),
            )
            self._load_params(Path(model_dir), lm_dtype)
        else:
            self.config = config or tiny_test_config()
            self.tokenizer = SyntheticSparkTokenizer(
                n_semantic=self.config.bicodec.quantizer.codebook_size,
                n_global=int(np.prod(self.config.bicodec.speaker_encoder.fsq_levels)),
            )
            self._random_init(seed, lm_dtype)

        self.sample_rate = self.config.sample_rate
        self.prompt_bucket = prompt_bucket
        self.wav_bucket = int(wav_bucket_s * self.sample_rate)
        self.max_new_tokens = max_new_tokens or self.config.sampling.max_new_tokens
        self.lm_dtype = lm_dtype
        # vocoder shape-bucket granularity in semantic tokens: small = less
        # padding compute, large = fewer compiled programs (benchmarks pin
        # this to the full budget so every request shares one program)
        self.vocode_bucket = 50
        if use_flash is None:  # auto: Pallas prefill on real accelerators only
            use_flash = jax.default_backend() != "cpu"
        self.use_flash = use_flash  # Pallas flash-attention prefill
        # guided decoding: constrain sampling to the TTS-legal token range —
        # ~8k semantic ids (+ globals/controls in controllable mode) + EOS out
        # of a 166k vocab.  Cuts the decode logits matmul and top-k to <8% of
        # full-vocab cost AND guarantees parseable output (the reference
        # samples the full vocab and regex-drops illegal tokens afterwards,
        # reference cli/SparkTTS.py:197-228).
        self.guided = guided
        # speculative decoding: k > 0 enables draft-k-then-verify-once with an
        # early-exit self-speculative draft (first `draft_layers` layers of
        # the LM — zero-copy slice of the stacked layer params).  Exact: the
        # output distribution equals vanilla decode (lm/speculative.py).
        self.speculative_k = speculative_k
        self.draft_layers = draft_layers
        # disaggregated serving: place the codec stack (wav2vec2 + BiCodec)
        # on its own device so vocoding overlaps LM decode — the reference
        # gets this from separate Triton model instances; here it's jax
        # device placement (jit runs where its arguments live).  The LM stays
        # on the default device (or a sharded mesh).
        self.codec_device = codec_device
        if codec_device is not None:
            self.bicodec_params = jax.device_put(self.bicodec_params, codec_device)
            self.w2v_params = jax.device_put(self.w2v_params, codec_device)
        # multi-chip serving: set by shard_llm(mesh)
        self.mesh = None

        # encoder time-compression: semantic tokens per wav2vec2 frame
        self._enc_ratio = int(np.prod(self.config.bicodec.encoder.sample_ratios))
        self._wave_upsample = int(np.prod(self.config.bicodec.decoder.rates)) * int(
            np.prod(self.config.bicodec.prenet.sample_ratios)
        )

        self._jit_cache: Dict[tuple, object] = {}

        # voice cache: (global, semantic) token LRU keyed by prompt-wav
        # content.  Production TTS typically serves ONE voice across many
        # texts — a hit skips the whole audio-tokenize stack (wav2vec2
        # forward + BiCodec encode + speaker path) per request.  Tokenize is
        # a pure function of the wav, so the cache is output-transparent.
        # The reference re-tokenizes every request (its Triton
        # audio_tokenizer model has no cache) — this is beyond-parity.
        # Off by default (0): recorded benchmarks compare against the
        # reference without it.
        self.voice_cache_size = voice_cache_size
        self._voice_cache: "OrderedDict[bytes, tuple]" = OrderedDict()
        self._voice_lock = threading.Lock()
        self.voice_cache_stats = {"hits": 0, "misses": 0}

    # ------------------------------------------------------------------
    # multi-chip serving
    # ------------------------------------------------------------------

    def shard_llm(self, mesh) -> None:
        """Shard the LM over a `jax.sharding.Mesh` (megatron-style specs:
        tp-column/row attention + MLP, vocab-sharded embedding) and replicate
        the codec stack on the SAME devices, so every serving program —
        including the fused tokenize+assemble+prefill admission — runs under
        GSPMD on the mesh.  Engines built after this call place their decode
        state on the mesh too (`lm/continuous.init_slots` via the server's
        `mesh=` plumbing).  Role of the reference's multi-GPU TRT-LLM engine
        build (`convert_checkpoint.py --tp_size`), as mesh placement instead
        of weight-file surgery."""
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from sparktts_tpu.parallel.shardings import qwen_param_specs

        if self.codec_device is not None:
            raise ValueError("shard_llm and codec_device are mutually exclusive")
        self.llm_params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            self.llm_params,
            qwen_param_specs(self.config.llm),
        )
        replicated = NamedSharding(mesh, P())
        self.bicodec_params = jax.device_put(self.bicodec_params, replicated)
        self.w2v_params = jax.device_put(self.w2v_params, replicated)
        self.mesh = mesh

    # ------------------------------------------------------------------
    # voice cache
    # ------------------------------------------------------------------

    def voice_cache_key(self, audio) -> Optional[bytes]:
        """Cache key for a prompt voice, or None when the cache is off.
        Array input is keyed by content hash; path input by
        (realpath, size, mtime) — the standard stat signature, so an
        edited file re-tokenizes."""
        if self.voice_cache_size <= 0 or audio is None:
            return None
        if isinstance(audio, (str, Path)):
            st = os.stat(audio)
            basis = f"p:{os.path.realpath(audio)}:{st.st_size}:{st.st_mtime_ns}".encode()
        else:
            a = np.ascontiguousarray(audio)
            basis = b"a:" + str((a.shape, a.dtype)).encode() + a.tobytes()
        return hashlib.blake2b(basis, digest_size=16).digest()

    def voice_cache_get(self, key: Optional[bytes]):
        """(global_t, semantic, true_sem) for a cached voice, else None."""
        if key is None:
            return None
        with self._voice_lock:
            hit = self._voice_cache.get(key)
            if hit is not None:
                self._voice_cache.move_to_end(key)
                self.voice_cache_stats["hits"] += 1
            else:
                self.voice_cache_stats["misses"] += 1
            return hit

    def voice_cache_put(self, key: Optional[bytes], value: tuple) -> None:
        if key is None:
            return
        with self._voice_lock:
            self._voice_cache[key] = value
            self._voice_cache.move_to_end(key)
            while len(self._voice_cache) > self.voice_cache_size:
                self._voice_cache.popitem(last=False)

    # ------------------------------------------------------------------
    # weights
    # ------------------------------------------------------------------

    def _random_init(self, seed: int, lm_dtype):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        self.bicodec_params = init_bicodec(k1, self.config.bicodec)
        self.w2v_params = init_wav2vec2(k2, self.config.wav2vec2)
        self.llm_params = init_qwen(k3, self.config.llm, dtype=lm_dtype)

    def _load_params(self, model_dir: Path, lm_dtype):
        """Convert the reference checkpoint layout (BiCodec/ + LLM/ +
        wav2vec2-large-xlsr-53/) to pytrees (reference `bicodec.py:69-111`,
        `cli/SparkTTS.py:48-50`).  Converted trees are cached under
        `<model_dir>/_tpu_cache/` (orbax) so later loads skip conversion."""
        cache_root = model_dir / "_tpu_cache"
        cached_bc = CKPT.load_param_cache(cache_root / "bicodec")
        cached_w2v = CKPT.load_param_cache(cache_root / "wav2vec2")
        cached_llm = CKPT.load_param_cache(cache_root / "llm")
        if cached_bc is not None and cached_w2v is not None and cached_llm is not None:
            # restore returns HOST arrays — commit them to device once here,
            # or every jitted call re-uploads the full weight trees
            self.bicodec_params = jax.tree.map(jnp.asarray, cached_bc)
            self.w2v_params = jax.tree.map(jnp.asarray, cached_w2v)
            self.llm_params = jax.tree.map(
                lambda x: jnp.asarray(
                    x, dtype=lm_dtype if jnp.issubdtype(np.asarray(x).dtype, np.floating) else None
                ),
                cached_llm,
            )
            return

        bc_state = CKPT.load_safetensors(model_dir / "BiCodec" / "model.safetensors")
        self.bicodec_params = jax.tree.map(
            jnp.asarray, CKPT.convert_bicodec(bc_state, self.config.bicodec)
        )
        w2v_state = _load_hf_state(model_dir / "wav2vec2-large-xlsr-53")
        self.w2v_params = jax.tree.map(
            jnp.asarray, CKPT.convert_wav2vec2(w2v_state, self.config.wav2vec2)
        )
        llm_state = _load_hf_state(model_dir / "LLM")
        self.llm_params = jax.tree.map(
            lambda x: jnp.asarray(x, dtype=lm_dtype),
            CKPT.convert_qwen(llm_state, self.config.llm),
        )
        try:
            CKPT.save_param_cache(cache_root / "bicodec", self.bicodec_params)
            CKPT.save_param_cache(cache_root / "wav2vec2", self.w2v_params)
            CKPT.save_param_cache(cache_root / "llm", self.llm_params)
        except Exception:  # cache is best-effort (read-only model dirs)
            logger.warning("could not write param cache under %s", cache_root, exc_info=True)

    # ------------------------------------------------------------------
    # jitted programs (shape-bucketed)
    # ------------------------------------------------------------------

    def _codec_arr(self, x, dtype=None):
        """Host array → device array on the codec's device (jit dispatches
        where its inputs live; mixed-device args are an error)."""
        arr = jnp.asarray(x, dtype=dtype)
        if self.codec_device is not None:
            arr = jax.device_put(arr, self.codec_device)
        return arr

    def _tokenize_fn(self, wav_len: int, ref_len: int):
        key = ("tokenize", wav_len, ref_len)
        if key not in self._jit_cache:
            cfg = self.config

            @jax.jit
            def fn(w2v_params, bc_params, wav, feature_mask, ref_wav):
                feat = wav2vec2_features(w2v_params, wav, cfg.wav2vec2, feature_mask)
                return bicodec_tokenize(bc_params, cfg.bicodec, feat, ref_wav)

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def _detokenize_fn(self, n_tokens: int):
        key = ("detokenize", n_tokens)
        if key not in self._jit_cache:
            cfg = self.config

            @jax.jit
            def fn(bc_params, semantic, global_t):
                return bicodec_detokenize(bc_params, cfg.bicodec, semantic, global_t)

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    # ------------------------------------------------------------------
    # audio tokenization (reference BiCodecTokenizer, audio_tokenizer.py)
    # ------------------------------------------------------------------

    def tokenize_host_prep(self, audio):
        """Host-side half of audio tokenization: wav load/normalize/pad and
        shape bookkeeping, WITHOUT dispatching the device program.  Returns
        (tokenize_fn, tok_args, true_semantic_len, s_pad) — callers either
        run `tokenize_fn(*tok_args)` directly (tokenize_audio_device) or
        inline it into a larger fused program (the fused admission,
        `lm/continuous.admit_prefill_fused`).  `tokenize_fn` comes from the
        per-shape jit cache, so its identity is stable — safe as a static
        jit argument."""
        if isinstance(audio, (str, Path)):
            wav = load_audio(
                audio,
                sampling_rate=self.sample_rate,
                volume_normalize=self.config.volume_normalize,
            )
        else:
            wav = np.asarray(audio, dtype=np.float64)

        ref_wav = get_ref_clip(
            wav, self.sample_rate, self.config.ref_segment_duration, self.config.latent_hop_length
        )

        true_len = len(wav)
        pad_len = _round_up(max(true_len, self.wav_bucket), self.wav_bucket)
        wav_in = np.zeros(pad_len, dtype=np.float32)
        if self.config.wav2vec2.do_normalize:
            wav_in[:true_len] = normalize_input(wav[None, :])[0]
        else:
            wav_in[:true_len] = wav

        true_frames_w2v = feature_lengths(self.config.wav2vec2, true_len)
        total_frames = feature_lengths(self.config.wav2vec2, pad_len)
        feature_mask = np.arange(total_frames)[None, :] < true_frames_w2v

        fn = self._tokenize_fn(pad_len, len(ref_wav))
        tok_args = (
            self.w2v_params,
            self.bicodec_params,
            self._codec_arr(wav_in)[None, :],
            self._codec_arr(feature_mask),
            self._codec_arr(ref_wav, dtype=jnp.float32)[None, :],
        )
        return fn, tok_args, true_frames_w2v // self._enc_ratio, total_frames // self._enc_ratio

    _KEY_UNSET = object()

    def tokenize_audio_device(self, audio, cache_key=_KEY_UNSET) -> Tuple[jax.Array, jax.Array, int]:
        """Audio path or float array → (global_tokens (1, N), semantic_tokens
        (1, S_pad), true_semantic_len) with the token arrays LEFT ON DEVICE —
        no host transfer.  The true semantic count is a deterministic
        function of the wav length, so callers (device-side prompt assembly,
        `serve/continuous_server.py`) never need to read the device arrays to
        know the shapes; on a tunneled TPU that saves a full relay round-trip
        per admission.

        `cache_key`: voice-cache key when the caller already looked it up
        (and missed) — skips the redundant get, still populates."""
        if cache_key is SparkTTSPipeline._KEY_UNSET:
            cache_key = self.voice_cache_key(audio)
            hit = self.voice_cache_get(cache_key)
            if hit is not None:
                return hit
        fn, tok_args, true_sem, _ = self.tokenize_host_prep(audio)
        with stage("tokenize_audio"):
            semantic, global_t = fn(*tok_args)
        self.voice_cache_put(cache_key, (global_t, semantic, true_sem))
        return global_t, semantic, true_sem

    def tokenize_audio(self, audio) -> Tuple[np.ndarray, np.ndarray]:
        """Audio path or float array → (global_tokens (1, N), semantic_tokens
        (1, T)) (reference `audio_tokenizer.py:119-130`)."""
        global_t, semantic, true_sem = self.tokenize_audio_device(audio)
        # crop semantic tokens to the true frame count
        return np.asarray(global_t), np.asarray(semantic)[:, :true_sem]

    def assemble_clone_ids(
        self,
        scaffold: np.ndarray,   # (t_pad,) int32 from clone_prompt_scaffold
        global_t: jax.Array,    # (1, N) device
        semantic: jax.Array,    # (1, S_pad) device
        g_off: int,
        s_off: int,
        n_sem: int,             # semantic ids to include (0 = none)
    ) -> jax.Array:
        """(1, t_pad) right-padded clone prompt ids, assembled ON DEVICE from
        the still-on-device codec tokens — token-identical to
        `build_clone_prompt` + host padding, with zero host syncs.  The B=1
        case of `assemble_clone_ids_batch` (ONE masked-gather implementation
        to audit; the program count is unchanged: one per (t_pad, S_pad))."""
        return self.assemble_clone_ids_batch(
            np.asarray(scaffold, np.int32)[None, :],
            global_t,
            semantic,
            np.asarray([g_off]),
            np.asarray([s_off]),
            np.asarray([n_sem]),
        )

    def detokenize(self, global_tokens: np.ndarray, semantic_tokens: np.ndarray) -> np.ndarray:
        """(global (1, N), semantic (1, T)) → waveform np.float32 (T * hop,)
        (reference `audio_tokenizer.py:132-146`)."""
        semantic_tokens = np.asarray(semantic_tokens, dtype=np.int32)
        if isinstance(global_tokens, jax.Array):
            # device-resident speaker tokens (device-chained admission keeps
            # them on device): reshape/cast are dispatches, not host syncs
            global_tokens = jnp.reshape(global_tokens.astype(jnp.int32), (1, -1))
        else:
            global_tokens = np.asarray(global_tokens, dtype=np.int32).reshape(1, -1)
        t_true = semantic_tokens.shape[1]
        t_pad = _round_up(max(t_true, 1), self.vocode_bucket)
        # edge-replicate pad: avoids a spectral discontinuity at the crop point
        padded = np.pad(semantic_tokens, ((0, 0), (0, t_pad - t_true)), mode="edge")
        fn = self._detokenize_fn(t_pad)
        with stage("vocode"):
            wav = fn(
                self.bicodec_params,
                self._codec_arr(padded),
                self._codec_arr(global_tokens),
            )
        return np.asarray(wav)[0, : t_true * self._wave_upsample].astype(np.float32)

    def spec_vocode_chain(self, slot: int, target: int, global_tokens):
        """Single-slot `spec_vocode_chain_multi` (kept as the simple direct
        API; see there for semantics)."""
        return self.spec_vocode_chain_multi([(slot, target, 0, global_tokens)], 1)

    def _spec_chain_fn(self, batch: int, target: int):
        """Cached jitted body of the speculative first-chunk chain: row
        gather + windowed semantic extraction + (optionally packed-emitted)
        speaker ids + batched vocode + bitcast, as ONE XLA program.  Keyed by
        (batch, target); jit re-specializes per packed/dispatch shape.  One
        program per signature matters: the previous eager-op chain compiled
        a handful of first-seen tiny programs per NEW (batch, dispatch)
        combination — through the relay that landed multi-second stalls
        inside timed/live first chunks (13 s at the first conc-4 dispatch of
        BENCH_DATASET_r05's first recording)."""
        t_pad = _round_up(max(target, 1), self.vocode_bucket)
        key = ("spec_chain", batch, target, t_pad)
        if key not in self._jit_cache:
            cfg = self.config
            tok = self.tokenizer
            sem_base, n_sem = tok.semantic_base, tok.n_semantic
            g_base, n_glob_codes = tok.global_base, tok.n_global
            tn = cfg.bicodec.speaker_encoder.token_num
            up = self._wave_upsample

            @jax.jit
            def fn(bc_params, packed, slot_ids, offs, ctrl, globs):
                rows = packed[slot_ids]                      # (B, W)
                idx = offs[:, None] + jnp.arange(target)[None, :]
                ids = jnp.take_along_axis(rows, idx, axis=1)
                sem = jnp.clip(ids - sem_base, 0, n_sem - 1)
                # edge-replicate pad to the vocode bucket, like detokenize
                sem_p = sem[:, jnp.minimum(jnp.arange(t_pad), target - 1)]
                g_pack = jnp.clip(rows[:, 1 : 1 + tn] - g_base, 0, n_glob_codes - 1)
                g = jnp.where(ctrl[:, None], g_pack, globs)
                wav = bicodec_detokenize(bc_params, cfg.bicodec, sem_p, g)
                bits = jax.lax.bitcast_convert_type(
                    wav[:, : target * up].astype(jnp.float32).reshape(-1),
                    jnp.int32,
                )
                # the FLAT packed+audio transfer layout is produced inside
                # this one program: the hot path must enqueue ZERO eager ops
                # (every first-seen tiny program costs a multi-second relay
                # compile on this platform — the conc-4 first-chunk stalls)
                return jnp.concatenate([packed.reshape(-1), bits])

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def spec_vocode_chain_multi(self, specs, batch: int):
        """Build a `chain_fn` for the continuous engines' `step_chained`:
        speculatively vocode EVERY listed decode slot's first streaming chunk
        IN THE SAME device-dispatch chain as the decode micro-batch, as ONE
        batched vocoder program, and pack the waveform bits into the step
        result so the host fetches tokens + all first chunks in a single
        transfer (each blocking fetch costs a relay round-trip here).

        `specs` is a list of (slot, target, sem_off, global_tokens_or_None):

        * clone streams pass their (device-resident) speaker tokens and
          sem_off 0 — the first `target` emissions are assumed semantic;
        * controllable streams pass global_tokens=None and sem_off =
          token_num + 2 — the emission is assumed to be the trained layout
          `<|start_global_token|> g*token_num <|end_global_token|> sem...`
          (reference `cli/SparkTTS.py:222-228`), so the speaker identity is
          read from THIS dispatch's own tokens on device.

        All targets must share one vocode-bucket padding (streams follow the
        same chunk schedule, so first-chunk targets agree); `batch` pads the
        call with duplicate rows up to an already-compiled (batch, t_pad)
        batched-vocoder signature (callers gate on warm state — a cold
        signature would stall the decode chain on an XLA compile).

        Speculative: the caller validates each row against the fetched
        tokens (EOS inside the window / unexpected layout) and falls back to
        the normal vocode path per row.  Windows are edge-replicate padded
        exactly like `detokenize`, so a validated chunk is bit-identical to
        the normal path's."""
        assert specs and batch >= len(specs)
        target0 = specs[0][1]
        assert all(t == target0 for _, t, _, _ in specs), "mixed chunk targets"
        tn = self.config.bicodec.speaker_encoder.token_num
        fn = self._spec_chain_fn(batch, target0)
        # fixed-shape row descriptors, padded to `batch` by duplicating row 0
        # (outputs of pad rows are sliced off by the caller)
        rows = list(specs) + [specs[0]] * (batch - len(specs))
        slot_ids = np.asarray([r[0] for r in rows], np.int32)
        offs = np.asarray([r[2] for r in rows], np.int32)
        ctrl = np.asarray([r[3] is None for r in rows], bool)
        dummy = jnp.zeros((1, tn), jnp.int32)
        globs = jnp.concatenate(
            [
                dummy if g is None
                else jnp.reshape(jnp.asarray(g, dtype=jnp.int32), (1, -1))
                for *_, g in rows
            ],
            axis=0,
        )
        bc_params = self.bicodec_params

        def chain(packed: jax.Array) -> jax.Array:
            return fn(bc_params, packed, slot_ids, offs, ctrl, globs)

        return chain

    # ------------------------------------------------------------------
    # inference (reference cli/SparkTTS.py:157-236)
    # ------------------------------------------------------------------

    def inference(
        self,
        text: str,
        prompt_speech_path: Optional[str | Path] = None,
        prompt_text: Optional[str] = None,
        gender: Optional[str] = None,
        pitch: Optional[str] = None,
        speed: Optional[str] = None,
        temperature: float = 0.8,
        top_k: int = 50,
        top_p: float = 0.95,
        max_new_tokens: Optional[int] = None,
        seed: int = 0,
        greedy: bool = False,
    ) -> np.ndarray:
        wav, _ = self._synthesize_segment(
            text,
            prompt_speech_path=prompt_speech_path,
            prompt_text=prompt_text,
            gender=gender,
            pitch=pitch,
            speed=speed,
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            max_new_tokens=max_new_tokens,
            seed=seed,
            greedy=greedy,
        )
        return wav

    def _synthesize_segment(
        self,
        text: str,
        prompt_speech_path: Optional[str | Path] = None,
        prompt_text: Optional[str] = None,
        gender: Optional[str] = None,
        pitch: Optional[str] = None,
        speed: Optional[str] = None,
        temperature: float = 0.8,
        top_k: int = 50,
        top_p: float = 0.95,
        max_new_tokens: Optional[int] = None,
        seed: int = 0,
        greedy: bool = False,
        speaker_globals: Optional[np.ndarray] = None,
    ) -> tuple:
        """One prompt → (wav, codec global ids).  The returned global ids are
        the speaker identity actually used for vocoding — the tokenized
        prompt's (clone), the LLM-emitted ones (control), or the
        `speaker_globals` passed in (longform continuation: a clone prompt
        carrying ONLY global tokens, the reference's no-prompt-text clone
        form, reference `cli/SparkTTS.py:53-108`)."""
        global_token_ids: Optional[np.ndarray] = None
        if speaker_globals is not None:
            global_token_ids = np.asarray(speaker_globals, np.int32).reshape(1, -1)
            ids = build_clone_prompt(self.tokenizer, text, global_token_ids)
            mode = "clone"
        elif gender is not None:
            ids = build_control_prompt(self.tokenizer, text, gender, pitch, speed)
            mode = "control"
        else:
            global_token_ids, semantic_token_ids = self.tokenize_audio(prompt_speech_path)
            ids = build_clone_prompt(
                self.tokenizer,
                text,
                global_token_ids,
                semantic_token_ids if prompt_text is not None else None,
                prompt_text,
            )
            mode = "clone"

        generated = self.generate_tokens(
            ids,
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            max_new_tokens=max_new_tokens,
            seed=seed,
            greedy=greedy,
            mode=mode,
        )

        semantic_ids = extract_semantic_ids(self.tokenizer, generated)
        if mode == "control":
            from sparktts_tpu.prompt import padded_global_tokens

            global_token_ids = padded_global_tokens(
                self.tokenizer,
                generated,
                self.config.bicodec.speaker_encoder.token_num,
                warn=True,
            )
        if semantic_ids.size == 0:
            logger.warning("no semantic tokens generated; returning silence")
            return np.zeros(0, dtype=np.float32), global_token_ids

        return self.detokenize(global_token_ids, semantic_ids[None, :]), global_token_ids

    def inference_long(
        self,
        text: str,
        prompt_speech_path: Optional[str | Path] = None,
        prompt_text: Optional[str] = None,
        gender: Optional[str] = None,
        pitch: Optional[str] = None,
        speed: Optional[str] = None,
        temperature: float = 0.8,
        top_k: int = 50,
        top_p: float = 0.95,
        max_new_tokens: Optional[int] = None,
        seed: int = 0,
        greedy: bool = False,
        max_segment_chars: int = 400,
        inter_segment_silence_s: float = 0.1,
    ) -> np.ndarray:
        """Longform synthesis: sentence-split `text` into segments (≥ the
        reference, which truncates at the token budget), synthesize each with
        ONE stable voice, and concatenate.

        Voice stability: the first segment establishes the speaker identity —
        the tokenized prompt's global tokens (clone) or the LLM-emitted ones
        (control) — and every later segment is a clone prompt conditioned on
        exactly those global tokens, so the voice cannot drift between
        segments.  Per-segment seeds derive from `seed` (seed + index)."""
        from sparktts_tpu.utils.textseg import pack_segments

        segments = pack_segments(text, max_segment_chars)
        if len(segments) <= 1:
            return self.inference(
                text,
                prompt_speech_path=prompt_speech_path,
                prompt_text=prompt_text,
                gender=gender,
                pitch=pitch,
                speed=speed,
                temperature=temperature,
                top_k=top_k,
                top_p=top_p,
                max_new_tokens=max_new_tokens,
                seed=seed,
                greedy=greedy,
            )
        shared = dict(
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            max_new_tokens=max_new_tokens,
            greedy=greedy,
        )
        wavs = []
        speaker_globals: Optional[np.ndarray] = None
        for i, segment in enumerate(segments):
            if speaker_globals is None:
                wav, speaker_globals = self._synthesize_segment(
                    segment,
                    prompt_speech_path=prompt_speech_path,
                    prompt_text=prompt_text,
                    gender=gender,
                    pitch=pitch,
                    speed=speed,
                    seed=seed + i,
                    **shared,
                )
            else:
                wav, _ = self._synthesize_segment(
                    segment, speaker_globals=speaker_globals, seed=seed + i, **shared
                )
            if wav.size:
                wavs.append(wav)
        if not wavs:
            return np.zeros(0, dtype=np.float32)
        gap = np.zeros(
            int(self.sample_rate * max(inter_segment_silence_s, 0.0)), np.float32
        )
        joined = [wavs[0]]
        for wav in wavs[1:]:
            joined.append(gap)
            joined.append(wav)
        return np.concatenate(joined)

    def guided_constraint(self, mode: str = "clone"):
        """(vocab_slice, extra_ids) for guided decoding, or (None, ()) when
        disabled.  clone mode emits only semantic tokens + EOS; controllable
        mode additionally emits global tokens and the global/semantic control
        markers (reference cli/SparkTTS.py:157-228 output grammar)."""
        if not self.guided:
            return None, ()
        tok = self.tokenizer
        if mode == "control":
            lo = min(tok.semantic_base, tok.global_base)
            hi = max(tok.semantic_base + tok.n_semantic, tok.global_base + tok.n_global)
            extras = tuple(tok.eos_ids) + tuple(
                tok.token_id(t)
                for t in (
                    "<|start_global_token|>",
                    "<|end_global_token|>",
                    "<|start_semantic_token|>",
                    "<|end_semantic_token|>",
                )
            )
        else:
            lo, hi = tok.semantic_base, tok.semantic_base + tok.n_semantic
            extras = tuple(tok.eos_ids)
        extras = tuple(e for e in extras if not lo <= e < hi)
        return (lo, hi), extras

    def generate_tokens(
        self,
        prompt_ids,
        temperature: float = 0.8,
        top_k: int = 50,
        top_p: float = 0.95,
        max_new_tokens: Optional[int] = None,
        seed: int = 0,
        greedy: bool = False,
        mode: str = "clone",
    ) -> np.ndarray:
        """Run the LLM on one prompt; returns the generated id array (new
        tokens only, trimmed at EOS)."""
        max_new = max_new_tokens or self.max_new_tokens
        t_pad = _round_up(max(len(prompt_ids), 1), self.prompt_bucket)
        input_ids = np.full((1, t_pad), self.tokenizer.pad_id, np.int32)
        mask = np.zeros((1, t_pad), bool)
        input_ids[0, t_pad - len(prompt_ids) :] = prompt_ids
        mask[0, t_pad - len(prompt_ids) :] = True

        cache_len = t_pad + max_new
        vocab_slice, extra_ids = self.guided_constraint(mode)
        if self.speculative_k > 0:
            from sparktts_tpu.lm.speculative import (
                draft_config,
                draft_from_layers,
                speculative_generate,
                speculative_generate_greedy,
            )

            draft = draft_from_layers(self.llm_params, self.draft_layers)
            dcfg = draft_config(self.config.llm, self.draft_layers)
            with stage("llm_generate"):
                common = dict(
                    max_new_tokens=max_new,
                    cache_len=cache_len + self.speculative_k,
                    k=self.speculative_k,
                    eos_ids=tuple(self.tokenizer.eos_ids),
                    pad_id=self.tokenizer.pad_id,
                    vocab_slice=vocab_slice,
                    extra_ids=extra_ids,
                    cache_dtype=self.lm_dtype,
                )
                if greedy:
                    tokens, lengths, _ = speculative_generate_greedy(
                        self.llm_params, draft, self.config.llm, dcfg,
                        jnp.asarray(input_ids), jnp.asarray(mask), **common,
                    )
                else:
                    tokens, lengths, _ = speculative_generate(
                        self.llm_params, draft, self.config.llm, dcfg,
                        jnp.asarray(input_ids), jnp.asarray(mask),
                        jax.random.PRNGKey(seed),
                        temperature=temperature, top_k=top_k, top_p=top_p,
                        **common,
                    )
            n = int(lengths[0])
            return np.asarray(tokens)[0, :n]
        with stage("llm_generate"):
            tokens, lengths = generate(
                self.llm_params,
                self.config.llm,
                jnp.asarray(input_ids),
                jnp.asarray(mask),
                jax.random.PRNGKey(seed),
                max_new_tokens=max_new,
                cache_len=cache_len,
                temperature=temperature,
                top_k=top_k,
                top_p=top_p,
                eos_ids=tuple(self.tokenizer.eos_ids),
                pad_id=self.tokenizer.pad_id,
                greedy=greedy,
                cache_dtype=self.lm_dtype,
                use_flash=self.use_flash,
                vocab_slice=vocab_slice,
                extra_ids=extra_ids,
            )
        n = int(lengths[0])
        return np.asarray(tokens)[0, :n]


    # ------------------------------------------------------------------
    # batched APIs (serving path; reference Triton dynamic batching role)
    # ------------------------------------------------------------------

    def tokenize_audio_batch_device(self, wavs) -> Tuple[jax.Array, jax.Array, list]:
        """List of float arrays → (global (B, N), semantic (B, S_pad),
        [true_semantic_len]) with the token arrays LEFT ON DEVICE — the batch
        counterpart of `tokenize_audio_device` (true counts are host-known
        functions of the wav lengths)."""
        b = len(wavs)
        wavs = [np.asarray(w, dtype=np.float64) for w in wavs]
        lens = [len(w) for w in wavs]
        pad_len = _round_up(max(max(lens), self.wav_bucket), self.wav_bucket)

        wav_in = np.zeros((b, pad_len), np.float32)
        for i, w in enumerate(wavs):
            wav_in[i, : lens[i]] = (
                normalize_input(w[None, :])[0] if self.config.wav2vec2.do_normalize else w
            )

        ref_len = (
            int(self.sample_rate * self.config.ref_segment_duration)
            // self.config.latent_hop_length
            * self.config.latent_hop_length
        )
        refs = np.stack(
            [
                get_ref_clip(
                    w, self.sample_rate, self.config.ref_segment_duration, self.config.latent_hop_length
                )
                for w in wavs
            ]
        ).astype(np.float32)

        frame_counts = [feature_lengths(self.config.wav2vec2, l) for l in lens]
        total_frames = feature_lengths(self.config.wav2vec2, pad_len)
        feature_mask = np.arange(total_frames)[None, :] < np.asarray(frame_counts)[:, None]

        # same jitted body as the single path — jit specializes per shape
        fn = self._tokenize_fn(pad_len, ref_len)
        with stage("tokenize_audio_batch"):
            semantic, global_t = fn(
                self.w2v_params,
                self.bicodec_params,
                self._codec_arr(wav_in),
                self._codec_arr(feature_mask),
                self._codec_arr(refs),
            )
        return global_t, semantic, [f // self._enc_ratio for f in frame_counts]

    def tokenize_audio_batch(self, wavs) -> list:
        """List of float arrays → list of (global (1, N), semantic (1, T_i)).

        One padded batch through wav2vec2 (with a proper attention mask on the
        transformer) + BiCodec — the reference's Triton audio_tokenizer batch
        path (`model_repo/audio_tokenizer/1/model.py:86-137`)."""
        global_t, semantic, counts = self.tokenize_audio_batch_device(wavs)
        semantic = np.asarray(semantic)
        global_t = np.asarray(global_t)
        return [
            (global_t[i : i + 1], semantic[i : i + 1, : counts[i]])
            for i in range(len(wavs))
        ]

    def _assemble_fn_batch(self, t_pad: int, s_pad: int):
        """Cached jitted device-side clone-prompt assembly (batched masked
        gather).  Stable identity per (t_pad, s_pad) — safe as a static jit
        argument to the fused admission program."""
        key = ("assemble_b", t_pad, s_pad)
        if key not in self._jit_cache:
            g_base = self.tokenizer.global_base
            s_base = self.tokenizer.semantic_base

            @jax.jit
            def fn(scaffold, g, s, g_off, s_off, n_sem):
                pos = jnp.arange(t_pad)[None, :]
                n_g = g.shape[1]
                gi = jnp.clip(pos - g_off[:, None], 0, n_g - 1)
                from_g = jnp.take_along_axis(g, gi, axis=1) + g_base
                si = jnp.clip(pos - s_off[:, None], 0, s_pad - 1)
                from_s = jnp.take_along_axis(s, si, axis=1) + s_base
                in_g = (pos >= g_off[:, None]) & (pos < (g_off + n_g)[:, None])
                in_s = (pos >= s_off[:, None]) & (pos < (s_off + n_sem)[:, None])
                return jnp.where(
                    in_g, from_g, jnp.where(in_s, from_s, scaffold)
                ).astype(jnp.int32)

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    def assemble_clone_ids_batch(
        self,
        scaffolds: np.ndarray,   # (B, t_pad) int32, LEFT- or RIGHT-padded
        global_t: jax.Array,     # (B, N) device
        semantic: jax.Array,     # (B, S_pad) device
        g_offs: np.ndarray,      # (B,) per-row global-token offset
        s_offs: np.ndarray,      # (B,) per-row semantic-token offset
        n_sems: np.ndarray,      # (B,) semantic ids to include (0 = none)
    ) -> jax.Array:
        """Batched `assemble_clone_ids`: every row's audio tokens scattered
        into its scaffold on device, one program per (t_pad, S_pad)."""
        return self._assemble_fn_batch(scaffolds.shape[1], semantic.shape[1])(
            jnp.asarray(scaffolds),
            jnp.asarray(global_t, dtype=jnp.int32),
            jnp.asarray(semantic, dtype=jnp.int32),
            jnp.asarray(g_offs, dtype=jnp.int32),
            jnp.asarray(s_offs, dtype=jnp.int32),
            jnp.asarray(n_sems, dtype=jnp.int32),
        )

    def generate_and_vocode_batch(
        self,
        input_ids,               # (B, t_pad) LEFT-padded, device or host
        mask,                    # (B, t_pad) bool
        global_rows,             # (B, token_num) device or host
        temperature: float = 0.8,
        top_k: int = 50,
        top_p: float = 0.95,
        max_new_tokens: Optional[int] = None,
        seed=0,                  # int, or per-row seed sequence (see _seed_rng)
        greedy: bool = False,
    ):
        """Fused guided-clone offline path: LLM generation → ON-DEVICE
        semantic extraction → batched vocode → ONE packed host fetch.
        Valid for guided clone mode only, where every pre-EOS emission is a
        semantic id, so extraction is offset arithmetic with the on-device
        `lengths` — no host detour (each host sync costs a relay round-trip
        on a tunneled TPU).  With the vocode bucket at the full budget (the
        offline serving configuration) output is bit-identical to
        generate_tokens_batch + detokenize_batch.  Returns (wav_list,
        generated_token_list)."""
        assert self.guided, "fused generate+vocode requires guided decoding"
        tok = self.tokenizer
        max_new = max_new_tokens or self.max_new_tokens
        b, t_pad = input_ids.shape
        vocab_slice, extra_ids = self.guided_constraint("clone")
        with stage("llm_generate_vocode_fused"):
            tokens, lengths = generate(
                self.llm_params,
                self.config.llm,
                jnp.asarray(input_ids),
                jnp.asarray(mask),
                _seed_rng(seed, b),
                max_new_tokens=max_new,
                cache_len=t_pad + max_new,
                temperature=temperature,
                top_k=top_k,
                top_p=top_p,
                eos_ids=tuple(tok.eos_ids),
                pad_id=tok.pad_id,
                greedy=greedy,
                cache_dtype=self.lm_dtype,
                use_flash=self.use_flash,
                vocab_slice=vocab_slice,
                extra_ids=extra_ids,
            )
            last = jnp.take_along_axis(
                tokens, jnp.maximum(lengths - 1, 0)[:, None], axis=1
            )[:, 0]
            is_eos = jnp.zeros(lengths.shape, bool)
            for e in tok.eos_ids:
                is_eos = is_eos | (last == e)
            sem_count = lengths - (is_eos & (lengths > 0)).astype(lengths.dtype)
            bucket = _round_up(max(max_new, 1), self.vocode_bucket)
            # edge-replicate pad to the bucket, like detokenize/_batch
            idx = jnp.minimum(
                jnp.arange(bucket)[None, :], jnp.maximum(sem_count, 1)[:, None] - 1
            )
            sem = jnp.clip(
                jnp.take_along_axis(tokens, idx, axis=1) - tok.semantic_base,
                0,
                tok.n_semantic - 1,
            )
            wav = self._detokenize_fn(bucket)(
                self.bicodec_params, sem, jnp.asarray(global_rows, dtype=jnp.int32)
            )
            flat = jnp.concatenate(
                [
                    tokens.reshape(-1),
                    lengths.astype(jnp.int32),
                    sem_count.astype(jnp.int32),
                    jax.lax.bitcast_convert_type(
                        wav.reshape(-1).astype(jnp.float32), jnp.int32
                    ),
                ]
            )
            out = np.asarray(flat)  # the single host transfer
        toks_h = out[: b * max_new].reshape(b, max_new)
        lens_h = out[b * max_new : b * max_new + b]
        counts_h = out[b * max_new + b : b * max_new + 2 * b]
        wav_h = out[b * max_new + 2 * b :].view(np.float32).reshape(b, -1)
        up = self._wave_upsample
        wavs = [wav_h[i, : counts_h[i] * up].astype(np.float32) for i in range(b)]
        tokens_out = [toks_h[i, : lens_h[i]] for i in range(b)]
        return wavs, tokens_out

    def generate_tokens_batch(
        self,
        prompts,
        temperature: float = 0.8,
        top_k: int = 50,
        top_p: float = 0.95,
        max_new_tokens: Optional[int] = None,
        seed=0,                  # int, or per-row seed sequence (see _seed_rng)
        greedy: bool = False,
        mode: str = "clone",
    ):
        """List of prompt-id lists → list of generated id arrays.  One padded
        batch through one jitted generate program (the reference delegates
        this to Triton dynamic batching + TRT-LLM inflight batching)."""
        max_new = max_new_tokens or self.max_new_tokens
        b = len(prompts)
        longest = max(len(p) for p in prompts)
        t_pad = _round_up(max(longest, 1), self.prompt_bucket)
        input_ids = np.full((b, t_pad), self.tokenizer.pad_id, np.int32)
        mask = np.zeros((b, t_pad), bool)
        for i, p in enumerate(prompts):
            input_ids[i, t_pad - len(p) :] = p
            mask[i, t_pad - len(p) :] = True

        vocab_slice, extra_ids = self.guided_constraint(mode)
        with stage("llm_generate_batch"):
            tokens, lengths = generate(
                self.llm_params,
                self.config.llm,
                jnp.asarray(input_ids),
                jnp.asarray(mask),
                _seed_rng(seed, b),
                max_new_tokens=max_new,
                cache_len=t_pad + max_new,
                temperature=temperature,
                top_k=top_k,
                top_p=top_p,
                eos_ids=tuple(self.tokenizer.eos_ids),
                pad_id=self.tokenizer.pad_id,
                greedy=greedy,
                cache_dtype=self.lm_dtype,
                use_flash=self.use_flash,
                vocab_slice=vocab_slice,
                extra_ids=extra_ids,
            )
            tokens = np.asarray(tokens)
            lengths = np.asarray(lengths)
        return [tokens[i, : int(lengths[i])] for i in range(b)]

    def detokenize_batch(self, global_tokens: np.ndarray, semantic_list) -> list:
        """Batch vocode with per-sequence lengths: pad every sequence to the
        longest bucket, one vocoder program, crop per sequence."""
        b = len(semantic_list)
        t_max = max(s.shape[-1] for s in semantic_list)
        t_pad = _round_up(max(t_max, 1), self.vocode_bucket)
        padded = np.zeros((b, t_pad), np.int32)
        for i, s in enumerate(semantic_list):
            s = np.asarray(s, np.int32).reshape(-1)
            padded[i, : len(s)] = s
            if len(s) < t_pad and len(s) > 0:
                padded[i, len(s) :] = s[-1]  # edge-replicate
        fn = self._detokenize_fn(t_pad)
        with stage("vocode_batch"):
            wav = np.asarray(
                fn(
                    self.bicodec_params,
                    self._codec_arr(padded),
                    self._codec_arr(global_tokens, dtype=jnp.int32),
                )
            )
        return [
            wav[i, : np.asarray(semantic_list[i]).reshape(-1).shape[0] * self._wave_upsample].astype(
                np.float32
            )
            for i in range(b)
        ]


def _load_hf_state(model_dir: Path) -> Dict[str, np.ndarray]:
    """Load a HF model directory's weights as numpy (safetensors preferred,
    torch .bin fallback)."""
    st = model_dir / "model.safetensors"
    if st.exists():
        return CKPT.load_safetensors(st)
    # sharded safetensors
    shards = sorted(model_dir.glob("model-*.safetensors"))
    if shards:
        out: Dict[str, np.ndarray] = {}
        for s in shards:
            out.update(CKPT.load_safetensors(s))
        return out
    bin_path = model_dir / "pytorch_model.bin"
    if bin_path.exists():
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no weights found under {model_dir}")
