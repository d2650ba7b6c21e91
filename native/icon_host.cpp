// icon_host — native host-side builders for the icon_rt_tpu engine.
//
// The TPU owns the render path (XLA/Pallas); these are the host-runtime
// pieces that the reference implements natively (its thread-pool-driven
// accel builds and ingest, ref: common/thread_pool.h, parallel_for.h,
// hostCode.cu:652-701).  They are the dataset-load-time hot spots at
// R2B9 scale (~84M columns): locator binning and majorant-grid
// rasterization.  Exposed through a plain C ABI for ctypes; OpenMP
// parallel where safe.
//
// Build: native/build.sh (g++ -O3 -shared -fPIC -fopenmp).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// Locator binning (grid-of-lists over lat/lon), two-pass rectangle scatter.
//
// The GEOMETRY (lat/lon hulls incl. great-circle edge-bulge extrema, pole
// containment, dateline splits) is computed once in Python
// (icon_rt_tpu.models.locator._range_records) — one source of truth — and
// arrives here as (R, 5) i64 records (cell_id, la0, la1, lb0, lb1) sorted
// by cell id.  Pass 1 counts entries per bin; pass 2 fills a (n_bins, k)
// int32 table, -1 padded, in ascending cell-id order so query ties
// resolve exactly like the brute-force scan.
// ---------------------------------------------------------------------------

// counts: (n_lat*n_lon) int64, zero-initialized by the caller
void ih_locator_count(const int64_t* rec, int64_t n_rec, int n_lon,
                      int64_t* counts) {
  for (int64_t r = 0; r < n_rec; ++r) {
    const int64_t la0 = rec[r * 5 + 1], la1 = rec[r * 5 + 2];
    const int64_t lb0 = rec[r * 5 + 3], lb1 = rec[r * 5 + 4];
    for (int64_t la = la0; la <= la1; ++la)
      for (int64_t lb = lb0; lb <= lb1; ++lb)
        counts[la * n_lon + lb]++;
  }
}

// bins: (n_bins * k) int32 preset to -1; cursors: counts buffer reset to 0
void ih_locator_fill(const int64_t* rec, int64_t n_rec, int n_lon, int k,
                     int64_t* cursors, int32_t* bins) {
  for (int64_t r = 0; r < n_rec; ++r) {  // ascending cell-id order matters
    const int32_t cell = (int32_t)rec[r * 5];
    const int64_t la0 = rec[r * 5 + 1], la1 = rec[r * 5 + 2];
    const int64_t lb0 = rec[r * 5 + 3], lb1 = rec[r * 5 + 4];
    for (int64_t la = la0; la <= la1; ++la)
      for (int64_t lb = lb0; lb <= lb1; ++lb) {
        const int64_t b = la * n_lon + lb;
        bins[b * k + cursors[b]++] = cell;
      }
  }
}

// ---------------------------------------------------------------------------
// Majorant-grid rasterization: scatter (val_lo, val_hi) min/max into every
// bin of per-item index boxes (the reference's rasterizeBox/buildShell CAS
// atomics, ref: hostCode.cu:227-336, as plain scatter — builds are
// single-writer here).
// ---------------------------------------------------------------------------

void ih_rasterize_ranges(const int64_t* lo_idx, const int64_t* up_idx,
                         const float* val_lo, const float* val_hi,
                         int64_t n_items, int64_t dx, int64_t dy, int64_t dz,
                         float* vr_lo, float* vr_hi) {
  for (int64_t i = 0; i < n_items; ++i) {
    const int64_t x0 = lo_idx[i * 3], y0 = lo_idx[i * 3 + 1], z0 = lo_idx[i * 3 + 2];
    const int64_t x1 = up_idx[i * 3], y1 = up_idx[i * 3 + 1], z1 = up_idx[i * 3 + 2];
    const float vl = val_lo[i], vh = val_hi[i];
    for (int64_t z = z0; z <= z1; ++z)
      for (int64_t y = y0; y <= y1; ++y) {
        float* plo = vr_lo + (z * dx * dy + y * dx);
        float* phi = vr_hi + (z * dx * dy + y * dx);
        for (int64_t x = x0; x <= x1; ++x) {
          if (vl < plo[x]) plo[x] = vl;
          if (vh > phi[x]) phi[x] = vh;
        }
      }
  }
}

// ---------------------------------------------------------------------------
// Dataset ingest helpers: lat/lon crop mask + bounds/data-range scan
// (ref: hostCode.cu:741-808) — single pass over the raw records.
// ---------------------------------------------------------------------------

void ih_crop_mask(const float* lat, const float* lon, int64_t n_cells,
                  float lat_lo, float lat_hi, float lon_lo, float lon_hi,
                  uint8_t* keep) {
#pragma omp parallel for
  for (int64_t i = 0; i < n_cells; ++i) {
    bool ok = true;
    for (int k = 0; k < 3; ++k) {
      const float la = lat[i * 3 + k], lo = lon[i * 3 + k];
      ok &= (la >= lat_lo) & (la <= lat_hi) & (lo >= lon_lo) & (lo <= lon_hi);
    }
    keep[i] = ok ? 1 : 0;
  }
}

int ih_version() { return 1; }

}  // extern "C"
