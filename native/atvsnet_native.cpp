// Native runtime components for atvsnet_tpu.
//
// The TPU owns the compute path (JAX/XLA/Pallas); this library owns the host-side
// hot loops around it, replacing the reference's fusibile host code:
//   * masked point-cloud compaction (variable-length output of the consistency
//     kernel -> packed arrays), OpenMP-parallel prefix-sum + scatter
//     (cf. reference fusibile/fusibile.cu:279-325 copy_point_cloud_to_host)
//   * binary little-endian PLY writer (cf. fusibile/displayUtils.h:80-136 — there an
//     OpenMP loop serialized by a critical section; here one bulk fwrite of an
//     interleaved record buffer)
//
// C ABI for ctypes binding (no pybind11 in this environment).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Count set bytes in mask[0..n)
int64_t atv_count_mask(const uint8_t* mask, int64_t n) {
    int64_t count = 0;
#pragma omp parallel for reduction(+ : count)
    for (int64_t i = 0; i < n; ++i) count += mask[i] != 0;
    return count;
}

// Compact points/colors where mask is set.
//   mask   : (n,) uint8
//   points : (n, 3) float32, colors: (n, 3) float32 (0..255)
//   out_points : (m, 3) float32, out_colors : (m, 3) uint8, m = count(mask)
// Non-finite coordinates are zeroed (displayUtils.h:113-118 semantics).
// Returns number of points written.
int64_t atv_compact_points(const uint8_t* mask, const float* points, const float* colors,
                           int64_t n, float* out_points, uint8_t* out_colors) {
    // block-wise parallel prefix sum
    const int64_t kBlock = 1 << 16;
    const int64_t n_blocks = (n + kBlock - 1) / kBlock;
    std::vector<int64_t> block_counts(n_blocks, 0);

#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n_blocks; ++b) {
        const int64_t lo = b * kBlock, hi = (b + 1) * kBlock < n ? (b + 1) * kBlock : n;
        int64_t c = 0;
        for (int64_t i = lo; i < hi; ++i) c += mask[i] != 0;
        block_counts[b] = c;
    }
    std::vector<int64_t> block_offsets(n_blocks, 0);
    int64_t total = 0;
    for (int64_t b = 0; b < n_blocks; ++b) {
        block_offsets[b] = total;
        total += block_counts[b];
    }

#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n_blocks; ++b) {
        const int64_t lo = b * kBlock, hi = (b + 1) * kBlock < n ? (b + 1) * kBlock : n;
        int64_t o = block_offsets[b];
        for (int64_t i = lo; i < hi; ++i) {
            if (!mask[i]) continue;
            for (int k = 0; k < 3; ++k) {
                float v = points[3 * i + k];
                // zero non-finite coordinates
                out_points[3 * o + k] = (v == v && v < 3.4e38f && v > -3.4e38f) ? v : 0.0f;
                float c = colors[3 * i + k];
                c = c < 0.0f ? 0.0f : (c > 255.0f ? 255.0f : c);
                out_colors[3 * o + k] = (uint8_t)(c);
            }
            ++o;
        }
    }
    return total;
}

// Compact + back-project: consumes the device's packed (H*W, 4) uint8 chunk
// output [emit, r, g, b] plus the HOST-resident reference depth map, and
// recomputes world coordinates here (double) instead of transferring them from
// the device — the device->host link is latency/bandwidth bound and the float3
// coordinates were 12 of the 16 bytes/pixel (fusion/consistency.fuse_depth_maps).
//   X = Minv * (d*[x, y, 1] - P4)   (back-projection at integer pixel coords,
//                                    cf. reference fusibile.cu:56-65)
// out buffers sized by the caller (count of packed[4i] != 0). Non-finite
// coordinates are zeroed (displayUtils.h:113-118 semantics). Returns points written.
int64_t atv_compact_backproject(const uint8_t* packed, const float* depth,
                                const double* Minv, const double* P4,
                                int64_t H, int64_t W,
                                float* out_points, uint8_t* out_colors) {
    const int64_t n = H * W;
    const int64_t kBlock = 1 << 16;
    const int64_t n_blocks = (n + kBlock - 1) / kBlock;
    std::vector<int64_t> block_counts(n_blocks, 0);

#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n_blocks; ++b) {
        const int64_t lo = b * kBlock, hi = (b + 1) * kBlock < n ? (b + 1) * kBlock : n;
        int64_t c = 0;
        for (int64_t i = lo; i < hi; ++i) c += packed[4 * i] != 0;
        block_counts[b] = c;
    }
    std::vector<int64_t> block_offsets(n_blocks, 0);
    int64_t total = 0;
    for (int64_t b = 0; b < n_blocks; ++b) {
        block_offsets[b] = total;
        total += block_counts[b];
    }

#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < n_blocks; ++b) {
        const int64_t lo = b * kBlock, hi = (b + 1) * kBlock < n ? (b + 1) * kBlock : n;
        int64_t o = block_offsets[b];
        for (int64_t i = lo; i < hi; ++i) {
            if (!packed[4 * i]) continue;
            const double d = (double)depth[i];
            const double px = d * (double)(i % W) - P4[0];
            const double py = d * (double)(i / W) - P4[1];
            const double pz = d - P4[2];
            for (int k = 0; k < 3; ++k) {
                const double v = Minv[3 * k] * px + Minv[3 * k + 1] * py + Minv[3 * k + 2] * pz;
                const float vf = (float)v;
                out_points[3 * o + k] = (vf == vf && vf < 3.4e38f && vf > -3.4e38f) ? vf : 0.0f;
                out_colors[3 * o + k] = packed[4 * i + 1 + k];
            }
            ++o;
        }
    }
    return total;
}

// Write a binary_little_endian PLY with xyz float32 + rgb uchar.
// Returns 0 on success.
int atv_write_ply(const char* path, const float* points, const uint8_t* colors, int64_t n) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    fprintf(f,
            "ply\nformat binary_little_endian 1.0\nelement vertex %lld\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n",
            (long long)n);
    // interleave into a record buffer (15 bytes/point) and bulk-write
    const int64_t kChunk = 1 << 18;
    std::vector<uint8_t> buf(kChunk * 15);
    for (int64_t start = 0; start < n; start += kChunk) {
        const int64_t m = (start + kChunk < n) ? kChunk : n - start;
#pragma omp parallel for schedule(static)
        for (int64_t i = 0; i < m; ++i) {
            uint8_t* r = buf.data() + i * 15;
            memcpy(r, points + 3 * (start + i), 12);
            memcpy(r + 12, colors + 3 * (start + i), 3);
        }
        if (fwrite(buf.data(), 1, (size_t)(m * 15), f) != (size_t)(m * 15)) {
            fclose(f);
            return -2;
        }
    }
    fclose(f);
    return 0;
}

}  // extern "C"
