"""Multi-device SPMD correctness.

The analog of the reference's mpirun=4/8 testsuite variants
(tests/euler/*.mpirun=4.output): the same computation partitioned over
devices must reproduce the single-device result.  Here the node axis of
the state and all stencil arrays is sharded over an 8-device CPU mesh
(tests/conftest.py forces xla_force_host_platform_device_count=8) and
XLA GSPMD inserts the halo collectives.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ryujin_tpu.equations.euler import Euler
from ryujin_tpu.equations.euler_initial_states import make_initial_state
from ryujin_tpu.offline import assembly, geometry, structured
from ryujin_tpu.postprocess.error import interpolate_nodal
from ryujin_tpu.solver.hyperbolic import HyperbolicModule
from ryujin_tpu.solver.integrator import TimeIntegrator


def test_sharded_step_matches_single_device():
    n_dev = len(jax.devices())
    assert n_dev >= 2, "conftest should provide 8 virtual devices"

    eq = Euler(dim=2)
    mesh = geometry.rectangular_domain(
        [-5, -5], [5, 5], [1, 1], refinement=5,
        boundary_conditions=[4, 4, 4, 4],
    )
    data = assembly.assemble(mesh)
    packed = structured.pack_structured(
        data, mesh, pad_major=8 * n_dev
    )
    init = make_initial_state(
        eq, "isentropic vortex", direction=[1, 1], position=[-1, -1],
    )
    hm = HyperbolicModule(eq, packed, init, dtype=jnp.float64)
    ti = TimeIntegrator(hm, "erk 33", cfl_min=0.3, cfl_max=0.3,
                        cfl_recovery_strategy="none")
    U0 = interpolate_nodal(init, packed, eq, 0.0, jnp.float64)

    ref = np.asarray(ti.advance(U0, 0.0, 3)[0])

    # shard the node axis:
    from ryujin_tpu.parallel.sharding import (
        make_device_mesh, shard_state, shard_stencil,
    )

    device_mesh = make_device_mesh(n_dev)
    hm.stencil = shard_stencil(hm.stencil, device_mesh, packed.n_pad)
    hm._xla_stencil = hm.stencil
    U0s = shard_state(U0, device_mesh)
    ti2 = TimeIntegrator(hm, "erk 33", cfl_min=0.3, cfl_max=0.3,
                         cfl_recovery_strategy="none")
    out = np.asarray(ti2.advance(U0s, 0.0, 3)[0])

    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-12)
