"""Numerical gradient checking (reference gradient_check.py:8-181).

Functional formulation: `check_gradient` compares an analytic gradient
against two-point numerical differentiation at every element (same
delta/tol defaults as the reference).  The layer/model helpers mirror the
reference's harness: input gradients through a layer, parameter gradients,
and whole-model gradients including inputs.  All probed functions are
jitted (one compile per tensor shape; probes then run compiled).

Run under float64 (tests enable jax_enable_x64) — the reference ran in
NumPy float64 too; delta=1e-5 is below float32 resolution.
"""

import numpy as np

import jax
import jax.numpy as jnp


def check_gradient(f, x, delta=1e-5, tol=1e-4):
    """f: array -> (scalar loss, analytic grad).  True iff numeric == analytic.

    Same contract as reference gradient_check.check_gradient (:8-54):
    iterates every element, two-point formula (f(x+d) - f(x-d)) / 2d.
    """
    x = np.asarray(x, dtype=np.float64)
    _, analytic_grad = f(x)
    analytic_grad = np.asarray(analytic_grad)
    assert analytic_grad.shape == x.shape, (
        f'Gradient shape {analytic_grad.shape} != input shape {x.shape}')

    it = np.nditer(x, flags=['multi_index'])
    while not it.finished:
        ix = it.multi_index
        x_plus = x.copy()
        x_plus[ix] += delta
        x_minus = x.copy()
        x_minus[ix] -= delta
        numeric = (float(f(x_plus)[0]) - float(f(x_minus)[0])) / (2 * delta)
        analytic = analytic_grad[ix]
        if not np.isclose(numeric, analytic, tol):
            print(f'Gradients are different at {ix}. '
                  f'Analytic: {analytic}, Numeric: {numeric}')
            return False
        it.iternext()
    return True


def _probe(loss_fn):
    """Wrap a pure scalar fn into check_gradient's (loss, grad) contract,
    with a single jitted value_and_grad specialization."""
    vag = jax.jit(jax.value_and_grad(loss_fn))

    def f(x):
        loss, grad = vag(jnp.asarray(x))
        return float(loss), np.asarray(grad)

    return f


def _scalar_loss_through_layer(layer, params, inputs):
    """Sum-of-outputs scalar loss, used to probe layer gradients."""
    outs = layer.apply(params, inputs)
    return sum(jnp.sum(o) for o in outs)


def check_layer_gradient(layer, X, delta=1e-5, tol=1e-4):
    """Input-gradient check for a single layer (reference :57-82)."""
    X = np.asarray(X, dtype=np.float64)
    if not layer.is_initialized:
        layer.initialize_from_X([jnp.asarray(X)])
    params = layer.params
    f = _probe(lambda xi: _scalar_loss_through_layer(layer, params, [xi]))
    return check_gradient(f, X, delta, tol)


def check_layer_param_gradient(layer, X, param_name, delta=1e-5, tol=1e-4):
    """Parameter-gradient check for a single layer (reference :85-120)."""
    X = jnp.asarray(np.asarray(X, dtype=np.float64))
    if not layer.is_initialized:
        layer.initialize_from_X([X])
    params = dict(layer.params)
    w0 = np.asarray(params[param_name], dtype=np.float64)

    def loss_fn(wi):
        p = dict(params)
        p[param_name] = wi
        return _scalar_loss_through_layer(layer, p, [X])

    return check_gradient(_probe(loss_fn), w0, delta, tol)


def check_model_gradient(model, X, y, delta=1e-5, tol=1e-4,
                         check_inputs=True):
    """Whole-model check: every parameter tensor and (optionally) every
    model input (reference :123-181)."""
    X_list = [jnp.asarray(np.asarray(x, dtype=np.float64))
              for x in (X if isinstance(X, list) else [X])]
    y_list = [jnp.asarray(np.asarray(t, dtype=np.float64))
              for t in (y if isinstance(y, list) else [y])]
    if not model.is_initialized:
        model.initialize([tuple(x.shape) for x in X_list])
    params = model.params

    for layer_name in params:
        for param_name in params[layer_name]:
            w0 = np.asarray(params[layer_name][param_name], dtype=np.float64)

            def loss_fn(wi, _ln=layer_name, _pn=param_name):
                p = {ln: dict(lp) for ln, lp in params.items()}
                p[_ln][_pn] = wi
                total, _ = model.loss_fn(p, X_list, y_list)
                return total

            if not check_gradient(_probe(loss_fn), w0, delta, tol):
                print(f'Check failed for {layer_name}/{param_name}')
                return False

    if check_inputs:
        for in_id, x0 in enumerate(X_list):
            def loss_fn(xi, _i=in_id):
                xs = list(X_list)
                xs[_i] = xi
                total, _ = model.loss_fn(params, xs, y_list)
                return total

            if not check_gradient(_probe(loss_fn), np.asarray(x0), delta, tol):
                print(f'Check failed for model input {in_id}')
                return False

    return True
