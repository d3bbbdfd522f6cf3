"""Shared stub installer for importing reference modules at test time.

Both oracle suites (test_reference_oracle.py, test_coco_oracle.py) import
reference files that expect mmengine/pycocotools/tqdm. Each previously
installed its own partial ``mmengine`` stub guarded by ``"mmengine" in
sys.modules`` — whichever test ran first left the other with missing
submodules. This helper is additive and idempotent: it fills in every
submodule the reference files touch, regardless of prior installs.
"""
from __future__ import annotations

import sys
import types


def install_mmengine_stub() -> None:
    mm = sys.modules.get("mmengine")
    if mm is None:
        mm = types.ModuleType("mmengine")
        sys.modules["mmengine"] = mm
    if "mmengine.registry" not in sys.modules:
        reg = types.ModuleType("mmengine.registry")

        class _Reg:
            def register_module(self, *a, **k):
                def deco(c):
                    return c

                return deco

        reg.OPTIMIZERS = _Reg()
        mm.registry = reg
        sys.modules["mmengine.registry"] = reg
    if "mmengine.logging" not in sys.modules:
        log = types.ModuleType("mmengine.logging")
        log.MessageHub = type("MessageHub", (), {})
        log.MMLogger = type("MMLogger", (), {})
        log.print_log = lambda *a, **k: None
        mm.logging = log
        sys.modules["mmengine.logging"] = log
    else:
        mm.logging = sys.modules["mmengine.logging"]


def install_pycocotools_stub() -> None:
    for name in ("pycocotools", "pycocotools.cocoeval", "tqdm"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    co = sys.modules["pycocotools.cocoeval"]
    if not hasattr(co, "COCOeval"):
        co.COCOeval = type("COCOeval", (), {})
    tq = sys.modules["tqdm"]
    if not hasattr(tq, "tqdm"):
        tq.tqdm = lambda x, *a, **k: x
