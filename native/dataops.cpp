// Native data-loader kernels for mapanything_tpu.
//
// The reference gets its host-side speed from PyTorch/torchvision/cv2 native
// code; this framework ships its own: the per-sample hot paths of the data
// loader (covisibility random-walk sampling over mmap'd matrices, image
// resize + normalization) implemented in C++ and exposed over a plain C ABI
// for ctypes (no pybind11 in this environment).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libdataops.so dataops.cpp -fopenmp
#include <cstdint>
#include <cstring>
#include <cmath>
#include <random>
#include <vector>
#include <unordered_set>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// Covisibility random-walk sampling (base_dataset.py:314 semantics):
// sample `num_samples` nodes forming a connected subgraph of the thresholded
// covisibility graph, with backtracking and multi-start retries.
// covis: row-major n x n float32; out: num_samples int32 (returns count).
// ---------------------------------------------------------------------------
int covis_random_walk(
    const float* covis, int n, int num_samples, float thres,
    uint64_t seed, int max_retries, int bidirectional, int32_t* out)
{
    std::mt19937_64 rng(seed);
    std::vector<int32_t> best;
    std::vector<uint8_t> excluded(n, 0);
    std::vector<float> pc(n);

    for (int attempt = 0; attempt < max_retries; ++attempt) {
        std::vector<int32_t> walk;
        std::vector<int32_t> stack;
        std::vector<uint8_t> visited(n, 0);

        // random unexcluded start
        std::vector<int32_t> avail;
        avail.reserve(n);
        for (int i = 0; i < n; ++i) if (!excluded[i]) avail.push_back(i);
        if (avail.empty()) break;
        int start = avail[rng() % avail.size()];
        walk.push_back(start);
        visited[start] = 1;
        stack.push_back(start);

        std::vector<int32_t> cand;
        while ((int)walk.size() < num_samples && !stack.empty()) {
            int cur = stack.back();
            const float* row = covis + (size_t)cur * n;
            if (bidirectional) {
                for (int j = 0; j < n; ++j)
                    pc[j] = 0.5f * (row[j] + covis[(size_t)j * n + cur]);
            } else {
                std::memcpy(pc.data(), row, n * sizeof(float));
            }
            float self = pc[cur] + 1e-8f;
            cand.clear();
            for (int j = 0; j < n; ++j) {
                if (j == cur || visited[j]) continue;
                if (pc[j] / self > thres) cand.push_back(j);
            }
            if (!cand.empty()) {
                int nxt = cand[rng() % cand.size()];
                walk.push_back(nxt);
                visited[nxt] = 1;
                stack.push_back(nxt);
            } else {
                stack.pop_back();
            }
        }
        if (walk.size() > best.size()) best = walk;
        if ((int)walk.size() >= num_samples) break;
        for (int i = 0; i < n; ++i) if (visited[i]) excluded[i] = 1;
    }
    int count = (int)std::min((size_t)num_samples, best.size());
    std::memcpy(out, best.data(), count * sizeof(int32_t));
    return count;
}

// ---------------------------------------------------------------------------
// uint8 HWC -> normalized float32 HWC with bilinear resize.
// src: (sh, sw, 3) uint8; dst: (dh, dw, 3) float32; mean/std: 3 floats.
// Matches torch 'bilinear, align_corners=False' coordinate mapping.
// ---------------------------------------------------------------------------
void resize_normalize_u8(
    const uint8_t* src, int sh, int sw,
    float* dst, int dh, int dw,
    const float* mean, const float* stdv)
{
    const float sy = (float)sh / dh;
    const float sx = (float)sw / dw;
    #pragma omp parallel for schedule(static)
    for (int i = 0; i < dh; ++i) {
        float fy = (i + 0.5f) * sy - 0.5f;
        fy = fy < 0 ? 0 : (fy > sh - 1 ? sh - 1 : fy);
        int y0 = (int)fy;
        int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
        float wy = fy - y0;
        for (int j = 0; j < dw; ++j) {
            float fx = (j + 0.5f) * sx - 0.5f;
            fx = fx < 0 ? 0 : (fx > sw - 1 ? sw - 1 : fx);
            int x0 = (int)fx;
            int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
            float wx = fx - x0;
            const uint8_t* p00 = src + ((size_t)y0 * sw + x0) * 3;
            const uint8_t* p01 = src + ((size_t)y0 * sw + x1) * 3;
            const uint8_t* p10 = src + ((size_t)y1 * sw + x0) * 3;
            const uint8_t* p11 = src + ((size_t)y1 * sw + x1) * 3;
            float* q = dst + ((size_t)i * dw + j) * 3;
            for (int c = 0; c < 3; ++c) {
                float v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c]) +
                          wy * ((1 - wx) * p10[c] + wx * p11[c]);
                q[c] = (v / 255.0f - mean[c]) / stdv[c];
            }
        }
    }
}

// ---------------------------------------------------------------------------
// Batched normalize only (uint8 HWC -> float32 HWC), no resize.
// ---------------------------------------------------------------------------
void normalize_u8(
    const uint8_t* src, int n, const float* mean, const float* stdv,
    float* dst)
{
    #pragma omp parallel for schedule(static)
    for (int i = 0; i < n; ++i) {
        int c = i % 3;
        dst[i] = (src[i] / 255.0f - mean[c]) / stdv[c];
    }
}

}  // extern "C"
