"""Subprocess entry: run the torch reference's OWN ``predict.py``.

Used by tests/test_reference_cli_oracle.py to produce oracle artifacts
(``{game}_court.json`` + mask PNGs) straight from
``/root/reference/predict.py`` on CPU.  Two shims make that possible in
this image:

  * kornia is not installed -> tests/torch_ref.py's validated stub;
  * the reference's 3-process pipeline uses torch.multiprocessing with
    the 'spawn' start method, which cannot pickle the stubbed modules
    into child interpreters.  Threads have identical semantics here
    (shared queues/events, CPU inference), so Process/Queue/Event are
    swapped for their threading twins before predict.py imports them.
"""
import os
import queue
import runpy
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from torch_ref import REFERENCE_PATH, install_kornia_stub  # noqa: E402

install_kornia_stub()
sys.path.insert(0, REFERENCE_PATH)

# torchvision is not installed either; the reference's utils/augmentation
# imports it at module level but the predict path never calls into it
# (BasicDataset with aug=None).  Empty module stubs satisfy the imports.
import types  # noqa: E402

_tv = types.ModuleType("torchvision")
_tv_t = types.ModuleType("torchvision.transforms")
_tv_f = types.ModuleType("torchvision.transforms.functional")
_tv.transforms = _tv_t
_tv_t.functional = _tv_f
for _n, _m in [("torchvision", _tv), ("torchvision.transforms", _tv_t),
               ("torchvision.transforms.functional", _tv_f)]:
    sys.modules[_n] = _m

import torch.multiprocessing as _tmp  # noqa: E402


class _Thread(threading.Thread):
    def __init__(self, target=None, args=()):
        super().__init__(target=target, args=args, daemon=True)


_tmp.Process = _Thread
_tmp.Queue = queue.Queue
_tmp.Event = threading.Event
_tmp.set_start_method = lambda *a, **k: None

# DataLoader worker processes also go through torch.multiprocessing;
# with the threading shims in place they cannot fork — use in-process
# loading (num_workers=0), which is semantics-identical for inference.
import torch.utils.data as _tud  # noqa: E402

_RealDataLoader = _tud.DataLoader


class _DataLoader(_RealDataLoader):
    def __init__(self, *a, **kw):
        kw["num_workers"] = 0
        kw["pin_memory"] = False
        super().__init__(*a, **kw)


_tud.DataLoader = _DataLoader

if __name__ == "__main__":
    sys.argv = ["predict.py"] + sys.argv[1:]
    runpy.run_path(os.path.join(REFERENCE_PATH, "predict.py"),
                   run_name="__main__")
