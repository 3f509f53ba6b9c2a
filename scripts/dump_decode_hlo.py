"""Dump the axon-compiled HLO for the 7B serving generate (p576/b16,
int8+kv8, fori, pc64) and print the definitions of the named hot fusions
from the decode-gap trace (scripts/probe_decode_gap.py), so the per-op
table's `fusion.NNNN` rows can be attributed to actual ops/shapes.

Run on the real chip: python scripts/dump_decode_hlo.py [fusion.2599 ...]
"""

from __future__ import annotations

import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench_vlm import device_params  # noqa: E402
from mmrs_tpu.models import llama  # noqa: E402
from mmrs_tpu.models.llama import LlamaConfig, LLAMA2_7B  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "fusion.2599", "fusion.2603", "fusion.2609", "fusion.2610",
        "fusion.2612", "convert_bitcast_fusion.60",
        "convert_bitcast_fusion.61", "convert_bitcast_fusion.62",
        "fusion.2606", "fusion.2600", "fusion.2602",
    ]
    cfg = LlamaConfig(max_seq=1024)
    assert (cfg.dim, cfg.layers) == (LLAMA2_7B.dim, LLAMA2_7B.layers)
    params = device_params(cfg, int8=True)

    @jax.jit
    def gen(params, tokens):
        embeds = llama.embed_tokens(params, tokens)
        return llama.greedy_generate(
            params, embeds, cfg, max_new_tokens=80, eos_token=-1,
            kv_dtype=jnp.int8, layers="fori", prefill_chunk=64)

    tokens = jnp.zeros((16, 576), jnp.int32)
    compiled = gen.lower(params, tokens).compile()
    txt = compiled.as_text()
    path = "/tmp/decode_serving_hlo.txt"
    with open(path, "w") as f:
        f.write(txt)
    print(f"HLO: {len(txt.splitlines())} lines -> {path}")

    # A fusion's definition is a `%name.N = ... fusion(...), calls=%fused_x`
    # line plus the called computation. Print the call line and the called
    # computation body (bounded) for each requested name.
    lines = txt.splitlines()
    for want in names:
        pat = re.compile(rf"%{re.escape(want)}\b")
        call_lines = [ln for ln in lines if pat.search(ln)]
        print(f"\n===== {want} ({len(call_lines)} refs) =====")
        for ln in call_lines:
            if "= " in ln and ("fusion(" in ln or "custom-call" in ln):
                print("  CALL:", ln.strip()[:400])
                m = re.search(r"calls=%?([\w.\-]+)", ln)
                if m:
                    comp = m.group(1)
                    # print the computation body
                    start = None
                    for i, l2 in enumerate(lines):
                        if re.match(rf"%?{re.escape(comp)}\s*[\(=]", l2.strip()):
                            start = i
                            break
                    if start is not None:
                        depth = 0
                        body = []
                        for l2 in lines[start:start + 120]:
                            body.append(l2)
                            depth += l2.count("{") - l2.count("}")
                            if depth <= 0 and len(body) > 1:
                                break
                        interesting = [b for b in body if re.search(
                            r"dot\(|dot_general|convert|transpose|copy\(|"
                            r"bitcast|dynamic-slice|dynamic-update-slice|"
                            r"reduce\(|broadcast|ROOT", b)]
                        for b in interesting[:25]:
                            print("    ", b.strip()[:300])


if __name__ == "__main__":
    main()
