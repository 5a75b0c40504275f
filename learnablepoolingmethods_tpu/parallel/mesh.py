"""Device mesh + sharding rules — the rebuild's communication backend.

The reference distributes via a TF1 gRPC parameter server with asynchronous
SGD (ref: train.py#ParameterServer, #start_server,
tf.train.replica_device_setter; SURVEY.md §2.4/§5.8).  The TPU-native
equivalent is GSPMD: one ``jax.sharding.Mesh`` over all chips, the batch axis
sharded over ``"data"``, parameters replicated, and XLA inserting the
gradient all-reduce (psum) over ICI.  There is deliberately no transport
code here — collectives ride ICI/DCN through XLA; this module owns mesh
construction, sharding rules, and multi-host init.

Synchronous DP replaces the reference's async-PS staleness by design
(SURVEY.md §2.4): same capability (scale-out data parallelism), better
convergence semantics, no PS hotspot.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DCN_AXIS = "dcn"     # across slices (data-center network)
DATA_AXIS = "data"   # across chips within a slice (ICI)
MODEL_AXIS = "model"


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (replaces TF_CONFIG cluster parsing,
    ref: train.py#main cluster setup).  No-op for single-process runs."""
    if coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data_parallelism: Optional[int] = None,
    model_parallelism: int = 1,
    dcn_parallelism: int = 1,
) -> Mesh:
    """Build a ("data", "model") — or ("dcn", "data", "model") — mesh.

    Parity scope needs only the data axis (SURVEY.md §2.4: TP/PP absent in
    the reference); the model axis exists for sharding the NetVLAD hidden FC
    (~285M params) when a config outgrows one chip's HBM.  A leading
    ``dcn`` axis models multi-slice scale-out: the batch shards over
    (dcn, data) so the gradient all-reduce hierarchically combines the
    cheap intra-slice ICI reduction with one inter-slice DCN hop — the
    standard multi-slice layout (XLA lowers the collective accordingly).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallelism is None:
        data_parallelism = n // (model_parallelism * dcn_parallelism)
    if data_parallelism * model_parallelism * dcn_parallelism != n:
        raise ValueError(
            f"mesh {dcn_parallelism}x{data_parallelism}x{model_parallelism}"
            f" != {n} devices"
        )
    if dcn_parallelism > 1:
        # On real multi-slice hardware the dcn axis must align with physical
        # slice boundaries or the "intra-slice" reduction silently crosses
        # DCN; mesh_utils reads each device's slice_index to guarantee it.
        try:
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_hybrid_device_mesh(
                (1, data_parallelism, model_parallelism),
                (dcn_parallelism, 1, 1),
                devices,
            )
        except Exception:  # noqa: BLE001 — virtual platforms lack slice_index
            import logging

            logging.getLogger(__name__).warning(
                "create_hybrid_device_mesh unavailable (no slice_index — "
                "virtual/single-slice platform); assuming device enumeration "
                "is slice-contiguous for the dcn axis"
            )
            dev_array = np.asarray(devices).reshape(
                dcn_parallelism, data_parallelism, model_parallelism
            )
        return Mesh(dev_array, (DCN_AXIS, DATA_AXIS, MODEL_AXIS))
    dev_array = np.asarray(devices).reshape(data_parallelism, model_parallelism)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data-parallel axes."""
    if DCN_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P((DCN_AXIS, DATA_AXIS)))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated (parameters, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put every array in a host batch with batch-axis sharding."""
    sharding = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) or hasattr(v, "shape"):
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v  # e.g. video_id byte strings stay on host
    return out


def put_batch_global(batch: dict, mesh: Mesh) -> dict:
    """Place a PER-PROCESS batch shard onto the global mesh.

    Single-process this is a plain batch-sharded device_put.  Multi-process
    (``distributed_init`` with process_count > 1, shard_by_process input
    sharding) each process passes only ITS shard and the global batch is the
    concatenation along the batch axis
    (``jax.make_array_from_process_local_data``) — a bare device_put would
    instead treat every process's shard as the whole global array, silently
    discarding (P−1)/P of the data each process loaded.  Every process must
    supply the same local batch size (pad the final partial batch).
    """
    sharding = batch_sharding(mesh)
    multiproc = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if not (isinstance(v, np.ndarray) or hasattr(v, "shape")):
            out[k] = v  # e.g. video_id byte strings stay on host
        elif multiproc:
            out[k] = jax.make_array_from_process_local_data(
                sharding, np.asarray(v)
            )
        else:
            out[k] = jax.device_put(v, sharding)
    return out


def shard_params(params, mesh: Mesh, min_size: int = 1 << 22):
    """Shard large matrix params' last axis over the model axis; replicate rest.

    Parity scope needs no tensor parallelism (SURVEY.md §2.4), but the Willow
    NetVLAD config's 278528×1024 hidden FC (~285M params) can exceed one
    chip's HBM headroom at fp32 — sharding its output axis over ``"model"``
    splits both the weight and its matmul, with XLA all-gathering activations
    over ICI.
    """
    model_size = mesh.shape[MODEL_AXIS]

    def rule(p):
        if (
            model_size > 1
            and p.ndim >= 2
            and p.size >= min_size
            and p.shape[-1] % model_size == 0
        ):
            spec = [None] * (p.ndim - 1) + [MODEL_AXIS]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(lambda p: jax.device_put(p, rule(p)), params)


def assemble_local_rows(arr) -> np.ndarray:
    """This process's rows of a (possibly sharded) 2-D array, as numpy.

    With a model axis in the mesh every data-axis row block is REPLICATED
    across it, so a device-order concatenation of ``addressable_shards``
    would repeat each block once per model-axis device (and a
    column-axis sharding would concatenate column blocks along the row
    axis).  Deduplicate by the shard's index ranges and stitch the unique
    blocks back in (row, column) order instead.  Used by train.py's
    metrics logging under multi-process + model parallelism."""
    uniq = {}
    for s in arr.addressable_shards:
        key = tuple(sl.start or 0 for sl in s.index)
        if key not in uniq:
            uniq[key] = np.asarray(s.data)
    row_starts = sorted({k[0] for k in uniq})
    col_starts = sorted({k[1] for k in uniq})
    return np.block([[uniq[(r, c)] for c in col_starts] for r in row_starts])


def pad_batch_to_multiple(batch: dict, multiple: int) -> dict:
    """Zero-pad the batch axis to a device-count multiple, extending the
    ``weights`` mask so padded rows are ignored downstream."""
    n = batch["features"].shape[0]
    rem = n % multiple
    if rem == 0:
        return batch
    pad = multiple - rem
    out = {}
    for k, v in batch.items():
        if k == "video_id":
            out[k] = list(v) + [b""] * pad
        elif hasattr(v, "shape") and v.ndim >= 1 and v.shape[0] == n:
            out[k] = np.concatenate(
                [v, np.zeros((pad,) + v.shape[1:], dtype=v.dtype)]
            )
        else:
            out[k] = v
    return out
