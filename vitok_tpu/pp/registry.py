"""Preprocessing string DSL.

Parity with reference ``vitok/pp/registry.py``: pipe-separated op specs like
``"center_crop(256)|flip|to_tensor|normalize(minus_one_to_one)|patchify(16, 256)"``
parsed via the ast module (bare identifiers become strings, so
``normalize(minus_one_to_one)`` works unquoted).
"""

from __future__ import annotations

import ast
import re
from functools import reduce
from typing import Any, Callable, Dict, Tuple

from vitok_tpu.pp.ops import OPS


def parse_op(op_str: str) -> Tuple[str, Tuple[Any, ...], Dict[str, Any]]:
    """Parse ``'name(args)'`` (or bare ``'name'``) into (name, args, kwargs)."""
    op_str = op_str.strip()
    if not op_str:
        raise ValueError("Empty op string")

    match = re.match(r"^(\w+)(?:\((.*)\))?$", op_str, re.DOTALL)
    if not match:
        raise ValueError(f"Invalid op syntax: '{op_str}'")

    name = match.group(1)
    args_str = match.group(2)
    if args_str is None or args_str.strip() == "":
        return name, (), {}

    try:
        tree = ast.parse(f"_({args_str})", mode="eval")
        call = tree.body
        args = tuple(_eval_arg(a) for a in call.args)
        kwargs = {kw.arg: _eval_arg(kw.value) for kw in call.keywords}
        return name, args, kwargs
    except SyntaxError as e:
        raise ValueError(f"Invalid arguments in '{op_str}': {e}")


def _eval_arg(node: ast.AST) -> Any:
    # Unquoted identifiers (e.g. minus_one_to_one) become strings.
    if isinstance(node, ast.Name):
        return node.id
    if isinstance(node, ast.Tuple):
        return tuple(_eval_arg(e) for e in node.elts)
    if isinstance(node, ast.List):
        return [_eval_arg(e) for e in node.elts]
    return ast.literal_eval(ast.unparse(node))


def build_transform(pp_string: str) -> Callable:
    """Compose a transform from a pipe-separated DSL string."""
    if not pp_string or not pp_string.strip():
        return lambda x: x

    fns = []
    for op_str in pp_string.split("|"):
        op_str = op_str.strip()
        if not op_str:
            continue
        name, args, kwargs = parse_op(op_str)
        if name not in OPS:
            available = ", ".join(sorted(OPS.keys()))
            raise KeyError(f"Unknown op: '{name}'. Available: {available}")
        fns.append(OPS[name](*args, **kwargs))

    if not fns:
        return lambda x: x

    def composed(x):
        return reduce(lambda v, f: f(v), fns, x)

    return composed


__all__ = ["build_transform", "parse_op", "OPS"]
