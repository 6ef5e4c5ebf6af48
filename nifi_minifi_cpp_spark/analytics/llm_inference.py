"""Batch LLM inference operator (RunLlamaCppInference shape).

Reference: /root/reference/extensions/llamacpp/processors/
RunLlamaCppInference.cpp:72 — render a prompt template per FlowFile,
run a local model, attach the completion. Spark-first this is the
anchor operator for LLM data pipelines: Arrow-batched mapInPandas so
a real backend can batch prompts onto an accelerator.

No inference runtime ships in this container, so the model call is
pluggable: pass ``generate_fn(list[str]) -> list[str]``; the default
is a deterministic extractive fake (echoes salient input tokens) so
pipelines run end-to-end. A llama-cpp-python backend drops in behind
the same signature (import-gated).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ..functions.templates import _MUSTACHE_RE


def deterministic_fake_generate(prompts: list[str]) -> list[str]:
    """Extractive stand-in: first 5 content words, reversed — stable
    across runs/workers, obviously fake."""
    out = []
    for p in prompts:
        words = [w for w in p.split() if w.isalpha()][:5]
        out.append("FAKE:" + " ".join(reversed(words)))
    return out


#: one model per python worker PROCESS, keyed by (backend, model,
#: params): executors must load the model themselves — a driver-loaded
#: model object would have to pickle through the closure, which llama
#: /torch handles can't do (and shouldn't: N workers want N device
#: contexts, loaded once each, reused across Arrow batches).
_PROCESS_MODEL_CACHE: dict = {}


def llama_cpp_generate(
    model_path: str, max_tokens: int = 128, **llama_kwargs
) -> Callable[[list[str]], list[str]]:
    """llama-cpp-python backend factory (RunLlamaCppInference.cpp:72
    runs llama.cpp in-process — same engine, import-gated here).

    The returned closure is cheap to pickle; the import and model load
    happen LAZILY inside the first call on each worker process and are
    cached in ``_PROCESS_MODEL_CACHE`` for the worker's lifetime."""

    def generate(prompts: list[str]) -> list[str]:
        try:
            from llama_cpp import Llama  # type: ignore[import-not-found]
        except ImportError as e:
            raise NotImplementedError(
                "llama-cpp-python is not installed in this environment; "
                "use the fake backend or install llama-cpp-python"
            ) from e
        key = ("llama", model_path, tuple(sorted(llama_kwargs.items())))
        llm = _PROCESS_MODEL_CACHE.get(key)
        if llm is None:
            llm = _PROCESS_MODEL_CACHE.setdefault(key, Llama(model_path=model_path, **llama_kwargs))
        return [llm(p, max_tokens=max_tokens)["choices"][0]["text"] for p in prompts]

    return generate


def hf_pipeline_generate(
    model_name: str, max_new_tokens: int = 128, **pipe_kwargs
) -> Callable[[list[str]], list[str]]:
    """transformers text-generation backend factory (import-gated; same
    lazy per-worker load discipline as the llama backend)."""

    def generate(prompts: list[str]) -> list[str]:
        try:
            from transformers import pipeline  # type: ignore[import-not-found]
        except ImportError as e:
            raise NotImplementedError(
                "transformers is not installed in this environment; "
                "use the fake backend or install transformers"
            ) from e
        key = ("hf", model_name, tuple(sorted(pipe_kwargs.items())))
        pipe = _PROCESS_MODEL_CACHE.get(key)
        if pipe is None:
            pipe = _PROCESS_MODEL_CACHE.setdefault(
                key, pipeline("text-generation", model=model_name, **pipe_kwargs)
            )
        outs = pipe(prompts, max_new_tokens=max_new_tokens, return_full_text=False)
        return [o[0]["generated_text"] if isinstance(o, list) else o["generated_text"] for o in outs]

    return generate


def resolve_backend(
    backend: str | Callable[[list[str]], list[str]],
    model_path: str | None = None,
    **backend_kwargs,
) -> Callable[[list[str]], list[str]]:
    """'fake' | 'llama' | 'hf' | a custom generate_fn -> generate_fn."""
    if callable(backend):
        return backend
    if backend == "fake":
        return deterministic_fake_generate
    if backend == "llama":
        if not model_path:
            raise ValueError("backend='llama' requires model_path (a .gguf file)")
        return llama_cpp_generate(model_path, **backend_kwargs)
    if backend == "hf":
        if not model_path:
            raise ValueError("backend='hf' requires model_path (a HF model name/dir)")
        return hf_pipeline_generate(model_path, **backend_kwargs)
    raise ValueError(f"unknown LLM backend {backend!r} (fake|llama|hf|callable)")


def run_llm_inference(
    df: DataFrame,
    prompt_template: str,
    generate_fn: Callable[[list[str]], list[str]] | None = None,
    batch_size: int = 32,
    output_col: str = "completion",
    backend: str | Callable[[list[str]], list[str]] = "fake",
    model_path: str | None = None,
    **backend_kwargs,
) -> DataFrame:
    """Render ``prompt_template`` ({{column}} placeholders) per row,
    run the generator over micro-batches, attach completions.

    ``backend``: 'fake' (deterministic extractive stand-in, the
    oracle-graded default), 'llama' (llama-cpp-python over
    ``model_path``, import-gated, lazily loaded per worker), 'hf'
    (transformers pipeline, same discipline), or any custom callable.
    ``generate_fn`` overrides the backend when given (back-compat).

    Prompts batch inside each Arrow chunk so an accelerator-backed
    generate_fn sees ``batch_size`` prompts per call.
    """
    import pandas as pd

    gen = generate_fn or resolve_backend(backend, model_path, **backend_kwargs)
    fields = _MUSTACHE_RE.findall(prompt_template)
    in_cols = list(df.columns)
    out_schema = ", ".join(f"`{c}` {t}" for c, t in df.dtypes) + f", `{output_col}` string"

    def run(batches):
        for pdf in batches:
            prompts = []
            for _, row in pdf.iterrows():
                p = prompt_template
                for f in fields:
                    p = p.replace("{{" + f + "}}", str(row.get(f, "")))
                prompts.append(p)
            completions: list[str] = []
            for i in range(0, len(prompts), batch_size):
                completions.extend(gen(prompts[i : i + batch_size]))
            out = pdf[in_cols].copy()
            out[output_col] = completions
            yield out

    from ..util import spread_for_cpu

    return spread_for_cpu(df).mapInPandas(run, out_schema)
