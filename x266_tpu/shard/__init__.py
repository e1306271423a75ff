"""T4 distribution layer (SURVEY.md §2.2).

P1 (data parallel): frames/GOPs spread over devices (all-intra pictures
are closed units, so this is exact).
P2 (spatial): independent tile bands of one picture spread over devices;
the serial reconstruction scan parallelizes across bands with
bit-identical bitstreams vs a single device (tests pin this).
P6 (wavefront): per-tile entropy segments coded concurrently on host
threads (the native coder releases the GIL) and stitched via slice-header
entry points.

Device parallelism uses explicit placement + JAX async dispatch for the
embarrassingly parallel tile/frame axes, and Mesh/shard_map with
collectives where cross-device dataflow exists (see
__graft_entry__.dryrun_multichip and, later, ME halo exchange P4).
"""

from x266_tpu.shard.parallel_encode import ShardedEncoder  # noqa: F401
from x266_tpu.shard.tiled_gop import encode_inter_tiled   # noqa: F401
