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


def llama_cpp_generate(model_path: str, **llama_kwargs) -> Callable[[list[str]], list[str]]:
    """Real backend factory (requires llama-cpp-python on the cluster;
    not present in this container)."""
    try:
        from llama_cpp import Llama  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - env without llama.cpp
        raise NotImplementedError(
            "llama-cpp-python is not installed in this environment; "
            "use deterministic_fake_generate or install the backend"
        ) from e

    llm = Llama(model_path=model_path, **llama_kwargs)  # pragma: no cover

    def generate(prompts: list[str]) -> list[str]:  # pragma: no cover
        return [llm(p)["choices"][0]["text"] for p in prompts]

    return generate


def run_llm_inference(
    df: DataFrame,
    prompt_template: str,
    generate_fn: Callable[[list[str]], list[str]] | None = None,
    batch_size: int = 32,
    output_col: str = "completion",
) -> DataFrame:
    """Render ``prompt_template`` ({{column}} placeholders) per row,
    run the generator over micro-batches, attach completions.

    Prompts batch inside each Arrow chunk so an accelerator-backed
    generate_fn sees ``batch_size`` prompts per call.
    """
    import pandas as pd

    gen = generate_fn or deterministic_fake_generate
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
