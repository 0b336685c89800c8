"""One-time importer for published Hadamard matrices of orders with no
classical prime-power construction (156, 172).

These orders come from combinatorial searches (Baumert-Hall-Golomb 1962
found H(172) via Williamson order 43; H(156) is Williamson order 39) and
are distributed as data tables — N.J.A. Sloane's Hadamard matrix library
is the canonical source, and the reference repo embeds the same tables in
flatquant/hadamard_utils.py (get_had156/get_had172). This script reads the
tables, VERIFIES the defining property H @ H.T == n * I exactly, and
writes them bit-packed (sign -> bit) into
flatquant_tpu/core/had_tables.npz (~7 KB total). It is mathematical data,
not code; the runtime constructs every other order itself
(Sylvester/Paley over prime-power fields).

Usage: python tools/import_had_tables.py [--reference /root/reference]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def extract_from_reference(ref_path: str, order: int) -> np.ndarray:
    sys.path.insert(0, ref_path)
    import types

    import torch  # noqa: F401  (reference tables are torch tensors)

    # hadamard_utils imports the fast_hadamard_transform CUDA package at
    # module level; only the data tables are needed here
    sys.modules.setdefault("fast_hadamard_transform", types.ModuleType("fht"))
    from flatquant import hadamard_utils

    t = getattr(hadamard_utils, f"get_had{order}")()
    return np.asarray(t.numpy(), np.float64)


def verify(h: np.ndarray) -> None:
    n = h.shape[0]
    assert h.shape == (n, n)
    assert np.all(np.abs(h) == 1.0), "entries must be +-1"
    gram = h @ h.T
    assert np.array_equal(gram, n * np.eye(n)), f"H.H^T != {n}I"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--orders", type=int, nargs="+", default=[156, 172])
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "..", "flatquant_tpu", "core",
            "had_tables.npz",
        ),
    )
    args = ap.parse_args()

    packed = {}
    for order in args.orders:
        h = extract_from_reference(args.reference, order)
        verify(h)
        bits = (h > 0).astype(np.uint8).reshape(-1)
        packed[f"h{order}"] = np.packbits(bits)
        print(f"order {order}: verified H.H^T == {order}I, "
              f"{packed[f'h{order}'].nbytes} bytes packed")
    np.savez_compressed(args.out, **packed)
    print(f"wrote {os.path.abspath(args.out)}")


if __name__ == "__main__":
    main()
