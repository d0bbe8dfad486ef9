// Native event-binning kernel for the SHD/SSC loader hot path.
//
// Replicates the reference pipeline's digitize + additive scatter
// (reference spiking_datasets.py:66-78: np.digitize over
// linspace(0, max_time, nb_steps) edges, then a sparse-COO-of-ones
// densification that sums duplicates) as a single C++ pass. The Python
// loader calls this through ctypes; sparch_tpu.data.native falls back to
// NumPy when the shared library is unavailable.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libsparch_binning.so binning.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>

extern "C" {

// Bin one utterance's events into a dense (nb_steps, nb_units) raster.
// `edges` are the nb_edges ascending bin edges (np.linspace result);
// index semantics match np.digitize(t, edges) == upper_bound(edges, t).
// Events digitizing past the last bin are dropped — the reference's
// sparse-to-dense conversion silently discards those out-of-range
// indices (spiking_datasets.py:66-78). `out` must be zero-initialised
// by the caller.
void bin_events(const double* times,
                const int64_t* units,
                int64_t n_events,
                const double* edges,
                int64_t n_edges,
                int64_t nb_steps,
                int64_t nb_units,
                float* out) {
  const double* edges_end = edges + n_edges;
  for (int64_t i = 0; i < n_events; ++i) {
    int64_t bin =
        static_cast<int64_t>(std::upper_bound(edges, edges_end, times[i]) - edges);
    if (bin >= nb_steps) continue;
    int64_t unit = units[i];
    if (unit < 0 || unit >= nb_units) continue;
    out[bin * nb_units + unit] += 1.0f;
  }
}

// Batched variant: events for `n_items` utterances are concatenated with
// CSR-style offsets; rasters are written contiguously into
// out[(item, step, unit)].
void bin_events_batch(const double* times,
                      const int64_t* units,
                      const int64_t* offsets,  // n_items + 1
                      int64_t n_items,
                      const double* edges,
                      int64_t n_edges,
                      int64_t nb_steps,
                      int64_t nb_units,
                      float* out) {
  const int64_t raster = nb_steps * nb_units;
  for (int64_t item = 0; item < n_items; ++item) {
    const int64_t lo = offsets[item], hi = offsets[item + 1];
    bin_events(times + lo, units + lo, hi - lo, edges, n_edges, nb_steps,
               nb_units, out + item * raster);
  }
}

}  // extern "C"
