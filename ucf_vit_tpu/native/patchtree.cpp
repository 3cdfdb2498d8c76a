// Native adaptive-patching kernels: greedy quadtree/octree build and 3D
// leaf resampling. The host-side hot loop of the data engine (SURVEY.md
// §3.3: per-sample tree build + per-leaf resize is what feeds the TPUs).
// Bit-exact with the numpy implementation in data/quadtree.py / octree.py:
// summed-area/volume tables for O(1) region sums, a lazy max-heap with
// insertion-order tie-breaking, children expanded in place (DFS order).
//
// Built with: g++ -O3 -march=native -shared -fPIC (see native/__init__.py).

#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

namespace {

struct Node {
    int32_t coord[6];  // x1,x2,y1,y2[,z1,z2]
    int64_t value;
    int32_t children[8];
    int8_t n_children;
};

typedef std::pair<std::pair<int64_t, int64_t>, int32_t> HeapEntry;
// ((value, -serial), node_index): max-heap -> value desc, serial asc.

}  // namespace

extern "C" {

// edges: [h, w] uint8. out_boxes: [fixed_length, 4] int32 (x1,x2,y1,y2).
// Returns number of leaves written.
int quadtree_build(const uint8_t* edges, int h, int w, int fixed_length,
                   int32_t* out_boxes, int64_t* out_values) {
    // summed-area table with zero border
    std::vector<int64_t> sat((size_t)(h + 1) * (w + 1), 0);
    for (int y = 0; y < h; ++y) {
        int64_t row = 0;
        for (int x = 0; x < w; ++x) {
            row += edges[(size_t)y * w + x];
            sat[(size_t)(y + 1) * (w + 1) + (x + 1)] =
                sat[(size_t)y * (w + 1) + (x + 1)] + row;
        }
    }
    auto rect_val = [&](int x1, int x2, int y1, int y2) -> int64_t {
        int64_t raw = sat[(size_t)y2 * (w + 1) + x2] -
                      sat[(size_t)y1 * (w + 1) + x2] -
                      sat[(size_t)y2 * (w + 1) + x1] +
                      sat[(size_t)y1 * (w + 1) + x1];
        return raw / 255;
    };

    std::vector<Node> arena;
    arena.reserve(2 * fixed_length + 8);
    Node root;
    root.coord[0] = 0; root.coord[1] = w; root.coord[2] = 0; root.coord[3] = h;
    root.value = rect_val(0, w, 0, h);
    root.n_children = 0;
    arena.push_back(root);

    std::priority_queue<HeapEntry> heap;
    heap.push({{arena[0].value, 0}, 0});
    int64_t serial = 1;
    int count = 1;

    while (count < fixed_length && !heap.empty()) {
        int32_t idx = heap.top().second;
        heap.pop();
        Node& nd = arena[idx];
        int x1 = nd.coord[0], x2 = nd.coord[1], y1 = nd.coord[2], y2 = nd.coord[3];
        if (x2 - x1 == 2) break;  // min leaf side (quadtree.py:124)
        int xm = (x1 + x2) / 2, ym = (y1 + y2) / 2;
        int quads[4][4] = {
            {x1, xm, ym, y2}, {xm, x2, ym, y2}, {x1, xm, y1, ym}, {xm, x2, y1, ym}};
        nd.n_children = 4;
        for (int c = 0; c < 4; ++c) {
            Node ch;
            std::memcpy(ch.coord, quads[c], 4 * sizeof(int32_t));
            ch.value = rect_val(quads[c][0], quads[c][1], quads[c][2], quads[c][3]);
            ch.n_children = 0;
            int32_t ci = (int32_t)arena.size();
            arena[idx].children[c] = ci;
            arena.push_back(ch);
            heap.push({{ch.value, -serial}, ci});
            ++serial;
        }
        count += 3;
    }

    // DFS flatten (children replace parent in place)
    std::vector<int32_t> stack;
    stack.push_back(0);
    int out = 0;
    while (!stack.empty()) {
        int32_t i = stack.back();
        stack.pop_back();
        const Node& nd = arena[i];
        if (nd.n_children == 0) {
            std::memcpy(out_boxes + (size_t)out * 4, nd.coord, 4 * sizeof(int32_t));
            out_values[out] = nd.value;
            ++out;
        } else {
            for (int c = nd.n_children - 1; c >= 0; --c)
                stack.push_back(nd.children[c]);
        }
    }
    return out;
}

// edges: [d0, d1, d2] uint8 (cubic). out_boxes: [fixed_length, 6]
// (x1,x2,y1,y2,z1,z2) — reference axis convention (octree.py:77).
int octree_build(const uint8_t* edges, int n, int64_t norm_factor,
                 int fixed_length, int32_t* out_boxes, int64_t* out_values) {
    const int s1 = n + 1;
    std::vector<int64_t> svt((size_t)s1 * s1 * s1, 0);
    for (int z = 0; z < n; ++z)
        for (int y = 0; y < n; ++y) {
            int64_t row = 0;
            for (int x = 0; x < n; ++x) {
                row += edges[((size_t)z * n + y) * n + x];
                // svt[z+1][y+1][x+1] = svt[z][y+1][x+1] + svt[z+1][y][x+1]
                //                    - svt[z][y][x+1] + rowsum
                svt[(((size_t)z + 1) * s1 + y + 1) * s1 + x + 1] =
                    svt[((size_t)z * s1 + y + 1) * s1 + x + 1] +
                    svt[(((size_t)z + 1) * s1 + y) * s1 + x + 1] -
                    svt[((size_t)z * s1 + y) * s1 + x + 1] + row;
            }
        }
    auto at = [&](int z, int y, int x) -> int64_t {
        return svt[((size_t)z * s1 + y) * s1 + x];
    };
    auto cube_val = [&](const int32_t* c) -> int64_t {
        int x1 = c[0], x2 = c[1], y1 = c[2], y2 = c[3], z1 = c[4], z2 = c[5];
        int64_t raw = at(z2, y2, x2) - at(z1, y2, x2) - at(z2, y1, x2) -
                      at(z2, y2, x1) + at(z1, y1, x2) + at(z1, y2, x1) +
                      at(z2, y1, x1) - at(z1, y1, x1);
        return raw / norm_factor;
    };

    std::vector<Node> arena;
    arena.reserve(2 * fixed_length + 16);
    Node root;
    int32_t rc[6] = {0, n, 0, n, 0, n};
    std::memcpy(root.coord, rc, sizeof(rc));
    root.value = cube_val(rc);
    root.n_children = 0;
    arena.push_back(root);

    std::priority_queue<HeapEntry> heap;
    heap.push({{arena[0].value, 0}, 0});
    int64_t serial = 1;
    int count = 1;

    while (count < fixed_length && !heap.empty()) {
        int32_t idx = heap.top().second;
        heap.pop();
        Node& nd = arena[idx];
        int x1 = nd.coord[0], x2 = nd.coord[1], y1 = nd.coord[2],
            y2 = nd.coord[3], z1 = nd.coord[4], z2 = nd.coord[5];
        if (x2 - x1 == 2) break;
        int xm = (x1 + x2) / 2, ym = (y1 + y2) / 2, zm = (z1 + z2) / 2;
        int octs[8][6] = {
            {x1, xm, y1, ym, z1, zm}, {xm, x2, y1, ym, z1, zm},
            {x1, xm, ym, y2, z1, zm}, {xm, x2, ym, y2, z1, zm},
            {x1, xm, y1, ym, zm, z2}, {xm, x2, y1, ym, zm, z2},
            {x1, xm, ym, y2, zm, z2}, {xm, x2, ym, y2, zm, z2}};
        nd.n_children = 8;
        for (int c = 0; c < 8; ++c) {
            Node ch;
            std::memcpy(ch.coord, octs[c], sizeof(octs[c]));
            ch.value = cube_val(octs[c]);
            ch.n_children = 0;
            int32_t ci = (int32_t)arena.size();
            arena[idx].children[c] = ci;
            arena.push_back(ch);
            heap.push({{ch.value, -serial}, ci});
            ++serial;
        }
        count += 7;
    }

    std::vector<int32_t> stack;
    stack.push_back(0);
    int out = 0;
    while (!stack.empty()) {
        int32_t i = stack.back();
        stack.pop_back();
        const Node& nd = arena[i];
        if (nd.n_children == 0) {
            std::memcpy(out_boxes + (size_t)out * 6, nd.coord, 6 * sizeof(int32_t));
            out_values[out] = nd.value;
            ++out;
        } else {
            for (int c = nd.n_children - 1; c >= 0; --c)
                stack.push_back(nd.children[c]);
        }
    }
    return out;
}

// Separable trilinear/nearest resample of [d1,h1,w1,c] f32 -> [m,m,m,c],
// reproducing the reference RegularGridInterpolator grid convention
// (source points linspace(0,n,n), queries linspace(0,n,m)) — octree.py:104+.
void resize3d(const float* src, int n, int c, float* dst, int m, int nearest) {
    if (n == m) {
        std::memcpy(dst, src, sizeof(float) * (size_t)n * n * n * c);
        return;
    }
    std::vector<int> lo(m);
    std::vector<float> fr(m);
    if (n == 1) {
        for (int i = 0; i < m; ++i) { lo[i] = 0; fr[i] = 0.f; }
    } else {
        double step = (double)n / (n - 1);
        for (int i = 0; i < m; ++i) {
            double q = (double)n * i / (m - 1 == 0 ? 1 : (m - 1));
            if (m == 1) q = 0;
            int idx = (int)(q / step);
            if (idx > n - 2) idx = n - 2;
            double f = (q - idx * step) / step;
            if (nearest) {
                lo[i] = f <= 0.5 ? idx : idx + 1;
                fr[i] = 0.f;
            } else {
                lo[i] = idx;
                fr[i] = (float)f;
            }
        }
    }
    auto S = [&](int z, int y, int x, int ch) -> float {
        return src[(((size_t)z * n + y) * n + x) * c + ch];
    };
    for (int z = 0; z < m; ++z)
        for (int y = 0; y < m; ++y)
            for (int x = 0; x < m; ++x)
                for (int ch = 0; ch < c; ++ch) {
                    int z0 = lo[z], y0 = lo[y], x0 = lo[x];
                    float fz = fr[z], fy = fr[y], fx = fr[x];
                    int z1 = z0 + (fz > 0.f ? 1 : 0);
                    int y1 = y0 + (fy > 0.f ? 1 : 0);
                    int x1 = x0 + (fx > 0.f ? 1 : 0);
                    if (z1 > n - 1) z1 = n - 1;
                    if (y1 > n - 1) y1 = n - 1;
                    if (x1 > n - 1) x1 = n - 1;
                    float c00 = S(z0, y0, x0, ch) * (1 - fx) + S(z0, y0, x1, ch) * fx;
                    float c01 = S(z0, y1, x0, ch) * (1 - fx) + S(z0, y1, x1, ch) * fx;
                    float c10 = S(z1, y0, x0, ch) * (1 - fx) + S(z1, y0, x1, ch) * fx;
                    float c11 = S(z1, y1, x0, ch) * (1 - fx) + S(z1, y1, x1, ch) * fx;
                    float c0 = c00 * (1 - fy) + c01 * fy;
                    float c1 = c10 * (1 - fy) + c11 * fy;
                    dst[(((size_t)z * m + y) * m + x) * c + ch] =
                        c0 * (1 - fz) + c1 * fz;
                }
}

}  // extern "C"
