"""Model summary printing (misc.print_module_summary counterpart).

The reference prints a per-module parameter/buffer/output-shape table via
forward hooks (utils/torch_utils/misc.py:212-282) when
``logging.print_model_summary``.  Flax modules are introspected statically:
this prints a per-submodule parameter-count table plus the total.
"""

from __future__ import annotations

import numpy as np



def print_model_summary(params, max_depth: int = 2) -> int:
    """Print a parameter-count table grouped to ``max_depth`` tree levels.

    Returns the total parameter count.
    """
    rows = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            key = "/".join(path[:max_depth])
            rows[key] = rows.get(key, 0) + int(np.prod(np.shape(node)))

    tree = params.get("params", params) if isinstance(params, dict) else params
    walk(tree, ())

    width = max((len(k) for k in rows), default=10) + 2
    print(f"{'Module':<{width}}{'Parameters':>12}")
    print("-" * (width + 12))
    total = 0
    for k in sorted(rows):
        print(f"{k:<{width}}{rows[k]:>12,}")
        total += rows[k]
    print("-" * (width + 12))
    print(f"{'Total':<{width}}{total:>12,}")
    return total
