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
// Locator binning (grid-of-lists over lat/lon), two-pass.
//
// Pass 1 counts entries per bin (dateline-crossing cells split into two
// wrapped lon ranges, matching icon_rt_tpu.models.locator.build_locator);
// pass 2 fills a (n_bins, k) int32 table, -1 padded, in ascending cell-id
// order so query ties resolve exactly like the brute-force scan.
// ---------------------------------------------------------------------------

static inline int clampi(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

struct LonRanges {
  int b0[2], b1[2];
  int n;
};

static inline void lon_bin_ranges(const float* lon, int64_t i, float lon_lo,
                                  float lon_hi, int n_lon, LonRanges* out) {
  const float l0 = lon[i * 3], l1 = lon[i * 3 + 1], l2 = lon[i * 3 + 2];
  float mn = std::min(l0, std::min(l1, l2));
  float mx = std::max(l0, std::max(l1, l2));
  const float scale = n_lon / (lon_hi - lon_lo);
  auto lbin = [&](float v) {
    return clampi((int)((v - lon_lo) * scale), 0, n_lon - 1);
  };
  if (mx - mn > (float)M_PI) {
    // dateline-crossing: [min positive .. pi] and [-pi .. max negative]
    float pos_min = 1e30f, neg_max = -1e30f;
    const float ls[3] = {l0, l1, l2};
    for (int k = 0; k < 3; ++k) {
      if (ls[k] > 0) pos_min = std::min(pos_min, ls[k]);
      if (ls[k] < 0) neg_max = std::max(neg_max, ls[k]);
    }
    out->n = 2;
    out->b0[0] = lbin(pos_min); out->b1[0] = n_lon - 1;
    out->b0[1] = 0;             out->b1[1] = lbin(neg_max);
  } else {
    out->n = 1;
    out->b0[0] = lbin(mn);
    out->b1[0] = lbin(mx);
  }
}

// counts: (n_lat*n_lon) int64, zero-initialized by the caller
void ih_locator_count(const float* lat, const float* lon, int64_t n_cells,
                      float lat_lo, float lat_hi, float lon_lo, float lon_hi,
                      int n_lat, int n_lon, int64_t* counts) {
  const float lat_scale = n_lat / (lat_hi - lat_lo);
  for (int64_t i = 0; i < n_cells; ++i) {
    const float a0 = lat[i * 3], a1 = lat[i * 3 + 1], a2 = lat[i * 3 + 2];
    int la0 = clampi((int)((std::min(a0, std::min(a1, a2)) - lat_lo) * lat_scale),
                     0, n_lat - 1);
    int la1 = clampi((int)((std::max(a0, std::max(a1, a2)) - lat_lo) * lat_scale),
                     0, n_lat - 1);
    LonRanges lr;
    lon_bin_ranges(lon, i, lon_lo, lon_hi, n_lon, &lr);
    for (int la = la0; la <= la1; ++la)
      for (int q = 0; q < lr.n; ++q)
        for (int lb = lr.b0[q]; lb <= lr.b1[q]; ++lb)
          counts[(int64_t)la * n_lon + lb]++;
  }
}

// bins: (n_bins * k) int32 preset to -1; cursors: counts buffer reset to 0
void ih_locator_fill(const float* lat, const float* lon, int64_t n_cells,
                     float lat_lo, float lat_hi, float lon_lo, float lon_hi,
                     int n_lat, int n_lon, int k, int64_t* cursors,
                     int32_t* bins) {
  const float lat_scale = n_lat / (lat_hi - lat_lo);
  for (int64_t i = 0; i < n_cells; ++i) {  // ascending id order matters
    const float a0 = lat[i * 3], a1 = lat[i * 3 + 1], a2 = lat[i * 3 + 2];
    int la0 = clampi((int)((std::min(a0, std::min(a1, a2)) - lat_lo) * lat_scale),
                     0, n_lat - 1);
    int la1 = clampi((int)((std::max(a0, std::max(a1, a2)) - lat_lo) * lat_scale),
                     0, n_lat - 1);
    LonRanges lr;
    lon_bin_ranges(lon, i, lon_lo, lon_hi, n_lon, &lr);
    for (int la = la0; la <= la1; ++la)
      for (int q = 0; q < lr.n; ++q)
        for (int lb = lr.b0[q]; lb <= lr.b1[q]; ++lb) {
          const int64_t b = (int64_t)la * n_lon + lb;
          bins[b * k + cursors[b]++] = (int32_t)i;
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
