"""Ray Data execution-context tuning for this engine's workloads.

One place for the DataContext knobs the pipelines assume, instead of
scattering them through scripts. Call once per driver process after
ray.init (the driver-contract module never calls it -- the driver owns
its context).
"""

from __future__ import annotations

MIB = 1024 * 1024


def configure_context(*, wide_binary: bool = False, quiet: bool = True):
    """Tune the current DataContext.

    wide_binary=True raises the target block size so large media payload
    rows (images/pdf pages) don't fragment into absurdly small blocks;
    text-only pipelines keep the default 128 MiB.
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    if quiet:
        ctx.enable_progress_bars = False
        try:
            ctx.execution_options.verbose_progress = False
        except AttributeError:
            pass
    # per-doc output order never matters (span order is data, offset col)
    ctx.execution_options.preserve_order = False
    if wide_binary:
        ctx.target_max_block_size = 512 * MIB
    return ctx
