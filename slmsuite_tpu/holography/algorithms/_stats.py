"""
Statistics bookkeeping, persistence, and plotting for holograms.

Device-side metric computation lives in :mod:`slmsuite_tpu.ops.stats`
(computed inside the optimization scan); this mixin manages the host-side
stats dictionary in the reference's schema, HDF5 round trips, and plots.

Parity: reference ``slmsuite/holography/algorithms/_stats.py``
(stats :7-208, save/load :225-309, plots :340-830).
"""

import numpy as np

from slmsuite_tpu.misc.files import load_h5, save_h5
from slmsuite_tpu.ops.stats import STAT_KEYS, calculate_stats_numpy


class _HologramStats:
    """Mixin providing stats management for :class:`Hologram` and subclasses."""

    # ------------------------------------------------------------------
    # Stats collection.
    # ------------------------------------------------------------------

    @staticmethod
    def _calculate_stats(
        feedback_amp,
        target_amp,
        efficiency_compensation=True,
        total=None,
        raw=False,
    ):
        """Host-side stats dict (see :meth:`ops.stats.calculate_stats_numpy`)."""
        return calculate_stats_numpy(
            feedback_amp,
            target_amp,
            efficiency_compensation=efficiency_compensation,
            total=total,
            raw=raw,
        )

    def _stats_pending_groups(self):
        """Stat groups that must be computed host-side (experimental data)."""
        return [
            group
            for group in self.flags.get("stat_groups", [])
            if "experimental" in group or "external" in group
        ]

    def _record_scan_stats(self, stats_array, start_iter):
        """
        Fold a device stats array of shape ``(n_iter, n_groups + 1, 4)``
        (from :meth:`ops.engine.run_gs`) into the stats dictionary.
        """
        stats_array = np.asarray(stats_array)
        groups = list(self.flags.get("stat_groups", []))

        for offset in range(stats_array.shape[0]):
            iteration = start_iter + offset
            stats = {}
            for g, group in enumerate(groups):
                row = stats_array[offset, g, :]
                if np.all(np.isnan(row)):
                    continue  # host-side group; filled elsewhere
                stats[group] = dict(zip(STAT_KEYS, (float(v) for v in row)))

            # The internal row tracks the fixed_phase flag history.
            self.flags["fixed_phase"] = bool(stats_array[offset, -1, 1])
            self._update_stats_dictionary(stats, iteration=iteration)

        # After the scan the flag reflects the final state.
        if stats_array.shape[0]:
            self.flags["fixed_phase"] = bool(self._final_fixed_phase)

    def _update_stats(self, stat_groups=[]):
        """Compute and record stats for the current iteration (stepwise path)."""
        stats = {}
        self._populate_stats(stats, stat_groups)
        self._update_stats_dictionary(stats)

    def _populate_stats(self, stats, stat_groups):
        """Fill ``stats`` for groups computable by this class."""
        if "computational" in stat_groups:
            stats["computational"] = self._calculate_stats(
                self.get_amp_ff(),
                np.asarray(self.target),
                efficiency_compensation=False,
                raw=bool(self.flags.get("raw_stats")),
            )

    def _update_stats_dictionary(self, stats, iteration=None):
        """
        Merge one iteration's ``{group: {stat: value}}`` into :attr:`stats`,
        padding all lists with nan so every series has equal length.
        """
        if iteration is None:
            iteration = self.iter

        # Methods.
        M = len(self.stats["method"])
        if iteration + 1 - M > 0:
            self.stats["method"].extend([""] * (iteration + 1 - M))
            M = iteration + 1
        self.stats["method"][iteration] = self.flags.get("method", "")

        # Flags (scalar history).
        flaglist = set(self.flags.keys()) | set(self.stats["flags"].keys())
        for flag in flaglist:
            series = self.stats["flags"].setdefault(flag, [np.nan] * M)
            if iteration + 1 - len(series) > 0:
                series.extend([np.nan] * (iteration + 1 - len(series)))
            if flag in self.flags:
                value = self.flags[flag]
                if not np.isscalar(value) and value is not None:
                    value = np.nan if not isinstance(value, (bool, int, float, str)) else value
                series[iteration] = value

        # Stat groups.
        grouplist = set(stats.keys()) | set(self.stats["stats"].keys())
        if grouplist:
            statlists = [set(stats[group].keys()) for group in stats]
            if self.stats["stats"]:
                first = next(iter(self.stats["stats"]))
                statlists.append(set(self.stats["stats"][first].keys()))
            statlist = set.union(*statlists) if statlists else set()

            for group in grouplist:
                record = self.stats["stats"].setdefault(group, {})
                for stat in statlist:
                    series = record.setdefault(stat, [np.nan] * M)
                    if iteration + 1 - len(series) > 0:
                        series.extend([np.nan] * (iteration + 1 - len(series)))
                    if group in stats and stat in stats[group]:
                        series[iteration] = stats[group][stat]

        # Raw farfields if requested.
        if self.flags.get("raw_stats"):
            raw = self.stats.setdefault("raw_farfield", [])
            if iteration + 1 - len(raw) > 0:
                raw.extend([np.nan] * (iteration + 1 - len(raw)))
            raw[iteration] = np.asarray(self.get_farfield())

    # ------------------------------------------------------------------
    # Persistence (ref _stats.py:225-309).
    # ------------------------------------------------------------------

    def save_stats(self, file_path, include_state=True):
        """
        Save the stats dictionary (and optionally current hologram state) to
        an HDF5 file.
        """
        data = {"stats": _listdict_to_h5(self.stats)}
        if include_state:
            to_save = {}
            for attr in ["phase", "amp", "target", "weights", "phase_ff", "amp_ff"]:
                value = getattr(self, attr, None)
                if value is not None:
                    to_save[attr] = np.asarray(value)
            to_save["iter"] = self.iter
            data["state"] = to_save
        save_h5(file_path, data)

    def load_stats(self, file_path, include_state=True):
        """Load stats (and optionally state) saved by :meth:`save_stats`."""
        data = load_h5(file_path)
        self.stats = _h5_to_listdict(data["stats"])
        if include_state and "state" in data:
            state = data["state"]
            for attr in ["phase", "amp", "target", "weights", "phase_ff", "amp_ff"]:
                if attr in state:
                    setattr(self, attr, np.asarray(state[attr]))
            if "iter" in state:
                self.iter = int(state["iter"])

    # ------------------------------------------------------------------
    # Plotting (ref _stats.py:340-830; simplified but same signatures).
    # ------------------------------------------------------------------

    def plot_nearfield(self, source=None, title="", padded=False, figsize=(8, 4), cbar=False):
        """Plot the nearfield amplitude and phase of the hologram (or of
        a given complex ``source`` array, reference-compatible)."""
        import matplotlib.pyplot as plt

        fig, axs = plt.subplots(1, 2, figsize=figsize)

        if source is None:
            amp = self.get_amp()
            phase_plot = self.phase
        else:
            source = np.asarray(source)
            amp = np.abs(source)
            phase_plot = np.angle(source)
        if np.isscalar(amp):
            amp = np.full(self.slm_shape, amp)

        im0 = axs[0].imshow(amp)
        axs[0].set_title("Nearfield amplitude")
        im1 = axs[1].imshow(
            np.mod(np.asarray(phase_plot), 2 * np.pi),
            cmap="twilight",
            vmin=0,
            vmax=2 * np.pi,
        )
        axs[1].set_title("Nearfield phase")
        if cbar:
            fig.colorbar(im0, ax=axs[0])
            fig.colorbar(im1, ax=axs[1])
        if title:
            fig.suptitle(title)
        plt.show()
        return fig

    def plot_farfield(self, source=None, title="", limits=None, units="knm", limit_padding=0.1, figsize=(8, 4), cbar=False, axs=None):
        """
        Plot the farfield (amplitude by default, or a given ``source``
        array), full view plus a zoom onto the target region.
        Returns the computed zoom limits for reuse.
        """
        import matplotlib.pyplot as plt

        if source is None:
            source = self.get_amp_ff()
            if source is None:
                self._populate_results()
                source = self.get_amp_ff()
        source = np.asarray(source)

        # Compute zoom limits from the target support if not provided.
        if limits is None:
            reference = np.asarray(self.target) if self.target is not None else source
            mask = np.nan_to_num(np.abs(reference)) > 0
            if np.any(mask):
                ys, xs = np.where(mask)
                pad_x = int((xs.max() - xs.min() + 1) * limit_padding) + 1
                pad_y = int((ys.max() - ys.min() + 1) * limit_padding) + 1
                limits = (
                    (max(xs.min() - pad_x, 0), min(xs.max() + pad_x, source.shape[1])),
                    (max(ys.min() - pad_y, 0), min(ys.max() + pad_y, source.shape[0])),
                )
            else:
                limits = ((0, source.shape[1]), (0, source.shape[0]))

        if axs is None:
            fig, axs = plt.subplots(1, 2, figsize=figsize)
        else:
            fig = axs[0].get_figure()
        im0 = axs[0].imshow(np.nan_to_num(np.abs(source)))
        axs[0].set_title("Farfield (full)")
        zoom = np.nan_to_num(
            np.abs(source[limits[1][0] : limits[1][1], limits[0][0] : limits[0][1]])
        )
        im1 = axs[1].imshow(zoom)
        axs[1].set_title("Farfield (zoom)")
        if cbar:
            fig.colorbar(im0, ax=axs[0])
            fig.colorbar(im1, ax=axs[1])
        if title:
            fig.suptitle(title)
        plt.show()
        return limits

    def plot_stats(self, stats_dict=None, stat_groups=[], ylim=None, show=False):
        """Plot the per-iteration convergence statistics. ``show`` calls
        ``plt.show()`` (reference-compatible; the figure is returned
        either way)."""
        import matplotlib.pyplot as plt

        if stats_dict is None:
            stats_dict = self.stats

        fig, ax = plt.subplots(1, 1, figsize=(8, 5))
        groups = stat_groups or list(stats_dict["stats"].keys())
        for group in groups:
            for stat, series in stats_dict["stats"][group].items():
                ax.plot(series, label=f"{group}:{stat}")
        ax.set_xlabel("Iteration")
        ax.legend(fontsize=7)
        if ylim is not None:
            ax.set_ylim(ylim)
        if show:
            plt.show()
        return fig


def _listdict_to_h5(tree):
    """Convert a stats tree with None/ragged values into h5-safe data."""
    if isinstance(tree, dict):
        return {str(k): _listdict_to_h5(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        try:
            arr = np.asarray(
                [np.nan if v is None else v for v in tree]
            )
            if arr.dtype == object:
                arr = np.asarray([str(v) for v in tree])
            return arr
        except Exception:
            return np.asarray([str(v) for v in tree])
    if tree is None:
        return np.nan
    return tree


def _h5_to_listdict(tree):
    """Inverse of :meth:`_listdict_to_h5` (arrays back to lists)."""
    if isinstance(tree, dict):
        return {k: _h5_to_listdict(v) for k, v in tree.items()}
    if isinstance(tree, np.ndarray) and tree.ndim == 1:
        return list(tree)
    return tree
