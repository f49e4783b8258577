"""Reference INI config compatibility (``config_reader()`` parity).

The reference ships an INI-style ``config`` file parsed by
``config_reader.py`` into (param, model_params) dicts (SURVEY.md C1).
Users migrating from the reference can point this loader at that same
file; its values overlay the framework's defaults.

Recognised keys ([param]): use_gpu, GPUdeviceNumber (ignored — device
selection is a JAX concern), modelID, octave, starting_range,
ending_range, scale_search, thre1, thre2, thre3, min_num, mid_num,
crop_ratio, bbox_ratio. ([models]): boxsize, stride, padValue, part_str.
"""

from __future__ import annotations

import ast
import configparser
import dataclasses

from tpupose.config import PoseConfig


def _parse_scale_search(raw: str) -> tuple[float, ...]:
    raw = raw.strip()
    if raw.startswith("["):
        return tuple(float(x) for x in ast.literal_eval(raw))
    return tuple(float(x) for x in raw.split(","))


def load_reference_config(path: str, base: PoseConfig | None = None) -> PoseConfig:
    """Parse a reference-format INI file onto a PoseConfig."""
    base = base or PoseConfig()
    cp = configparser.ConfigParser()
    read = cp.read(path)
    if not read:
        raise FileNotFoundError(path)

    inf = base.inference
    mdl = base.model

    if cp.has_section("param"):
        p = cp["param"]
        if "scale_search" in p:
            inf = dataclasses.replace(
                inf, scale_search=_parse_scale_search(p["scale_search"])
            )
        if "thre1" in p:
            inf = dataclasses.replace(inf, thre1=float(p["thre1"]))
        if "thre2" in p:
            inf = dataclasses.replace(inf, thre2=float(p["thre2"]))
        if "mid_num" in p:
            inf = dataclasses.replace(inf, mid_num=int(p["mid_num"]))

    # the reference nests per-model sections; accept both [models] and the
    # canonical [model1..] blocks, last one wins
    for section in cp.sections():
        if not section.startswith("model"):
            continue
        m = cp[section]
        if "boxsize" in m:
            mdl = dataclasses.replace(mdl, boxsize=int(m["boxsize"]))
        if "stride" in m:
            mdl = dataclasses.replace(mdl, stride=int(m["stride"]))
        if "padvalue" in m:
            mdl = dataclasses.replace(mdl, pad_value=int(m["padvalue"]))

    return dataclasses.replace(base, inference=inf, model=mdl)
