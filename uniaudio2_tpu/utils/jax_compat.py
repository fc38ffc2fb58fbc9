"""Workarounds for jax runtime bugs, applied at package import.

jax 0.9.0 C++-pjit fastpath corruption with hoisted constants
-------------------------------------------------------------
When a traced function's jaxpr ends up with constants that are *tracers*
(``pjit._trace_for_jit`` then calls ``pe.separate_consts`` and prepends the
constants to the argument list — ``pjit.py:557-597``), the Python dispatch
path executes correctly, but the fastpath data cached for the C++
``PjitFunction`` is built over the *merged* ``consts + args`` list
(``_get_fastpath_data`` receives ``args_flat`` of length
``n_consts + n_user_args`` with ``const_args=[]``).  The C++ wrapper,
however, replays the cached executable with only the *user* arguments, so
the second call of such a function dies with::

    INVALID_ARGUMENT: Execution supplied 118 buffers but compiled program
    expected 130 buffers

Tracer constants in a top-level jaxpr should not normally happen, but jax
0.9.0's own linearization machinery leaks them: running one jitted
``value_and_grad`` train step leaves dead ``DynamicJaxprTracer`` objects
(created while lowering ``lax.scan`` via ``mlir.lower_fun(_scan_impl)``)
reachable from internal caches, and a *second, structurally similar* jitted
train step in the same process picks one up as a constant of its jaxpr.
``jax.clear_caches()`` does not clear the path in question, and the leak is
insensitive to remat/donation/optimizer choice — any two distinct
train-step jits over the same model trigger it (see
``tests/test_jax_compat.py`` for the distilled repro).

The guard below wraps ``pjit._run_python_pjit`` and drops the compiled
executable from its return value whenever constants were hoisted into the
argument list (``p.consts`` non-empty).  ``_get_fastpath_data`` then
returns ``None``, so the C++ wrapper never caches the corrupt fastpath and
every call of the affected function takes the (correct) Python dispatch
path.  Unaffected functions — the overwhelmingly common case, where
``p.consts`` is empty and constants stay baked in the jaxpr — keep the
fastpath.  Dispatch overhead for affected functions is O(100 us)/call,
noise against multi-ms train steps.
"""

from __future__ import annotations

_installed = False


def install_pjit_const_fastpath_guard() -> None:
    """Idempotently install the fastpath guard (jax 0.9.x only)."""
    global _installed
    if _installed:
        return
    import jax

    if not jax.__version__.startswith("0.9."):
        # Re-evaluate against a newer jax before carrying the shim forward:
        # the upstream TODO at pjit.py:1248 ("remove num_const_args when
        # fixing the C++ path") suggests this is known and may be fixed.
        _installed = True
        return

    from jax._src import pjit as _pjit

    orig = _pjit._run_python_pjit

    def _run_python_pjit_guarded(p, args_flat, fun, jit_info, args, kwargs):
        out = orig(p, args_flat, fun, jit_info, args, kwargs)
        if p.consts:
            # Constants were hoisted into args_flat; the C++ fastpath would
            # replay the executable without them.  Hide the executable so
            # _get_fastpath_data declines to cache one.  Verify the 0.9.0
            # return layout before touching index 5 (outs, out_flat,
            # out_tree, args_flat, jaxpr, compiled, profiler, const_args):
            # a point-release reshuffle must leave the tuple alone rather
            # than silently nulling the wrong slot.
            layout_ok = (
                isinstance(out, tuple) and len(out) == 8
                and out[2] is p.out_tree
                and out[4] is p.params["jaxpr"]
            )
            if layout_ok:
                out = out[:5] + (None,) + out[6:]
            else:  # pragma: no cover - future-jax safety net
                import warnings

                warnings.warn(
                    "jax_compat: _run_python_pjit return layout changed; "
                    "pjit const-fastpath guard left the result untouched "
                    "(re-check the jax 0.9.x hoisted-const bug)",
                    RuntimeWarning,
                )
        return out

    _run_python_pjit_guarded._ua2_orig = orig  # for tests / uninstall
    _pjit._run_python_pjit = _run_python_pjit_guarded
    _installed = True
