// Permutohedral lattice high-dimensional Gaussian filtering (Adams,
// Baek, Davis 2010) — the exact filter behind dense-CRF bilateral message
// passing. The reference consumes this algorithm through the pydensecrf
// C++ wheel (`awesome/run/crf.py:4`); here it is implemented from the
// published algorithm as the framework's native host-side filter, used to
// validate the TPU bilateral-grid approximation and for exact host-side
// post-processing.
//
// C API (ctypes-friendly):
//   ph_filter(features[n*fd], n, fd, values[n*vd], vd, out[n*vd])
// Filters `values` with the Gaussian kernel exp(-|fi-fj|^2 / 2) over the
// feature space (features pre-scaled by 1/sigma).
//
// Build: make -C native   (produces libpermutohedral.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// Hash for lattice keys (short vectors of int16).
struct KeyHash {
    size_t operator()(const std::vector<short>& k) const {
        size_t h = 0;
        for (short v : k) h = h * 2531011 + static_cast<size_t>(v + 32768);
        return h;
    }
};

class PermutohedralLattice {
  public:
    PermutohedralLattice(int d, int n) : d_(d), n_(n) {
        offset_.resize((d_ + 1) * n_);
        barycentric_.resize((d_ + 1) * n_);
        scale_factor_.resize(d_);
        // Scaling to compensate lattice spacing (from the paper):
        // s_i = 1 / sqrt((i+1)(i+2)) * (d+1) * sqrt(2/3)
        float inv_std_dev = std::sqrt(2.0f / 3.0f) * (d_ + 1);
        for (int i = 0; i < d_; i++)
            scale_factor_[i] =
                inv_std_dev / std::sqrt(static_cast<float>((i + 1) * (i + 2)));
    }

    // Compute lattice simplex membership + barycentric weights per point.
    void splat_setup(const float* features) {
        std::vector<float> elevated(d_ + 1), rem0(d_ + 1), barycentric(d_ + 2);
        std::vector<int> rank(d_ + 1);
        std::vector<short> key(d_);
        std::unordered_map<std::vector<short>, int, KeyHash> hash;

        for (int p = 0; p < n_; p++) {
            const float* f = features + p * d_;
            // Elevate to the hyperplane sum(x)=0 in d+1 dims (E matrix).
            float sm = 0.f;
            for (int j = d_; j > 0; j--) {
                float cf = f[j - 1] * scale_factor_[j - 1];
                elevated[j] = sm - j * cf;
                sm += cf;
            }
            elevated[0] = sm;

            // Nearest remainder-0 lattice point.
            float down_factor = 1.0f / (d_ + 1);
            float up_factor = static_cast<float>(d_ + 1);
            int sum = 0;
            for (int i = 0; i <= d_; i++) {
                float v = down_factor * elevated[i];
                float up = std::ceil(v) * up_factor;
                float down = std::floor(v) * up_factor;
                rem0[i] = (up - elevated[i] < elevated[i] - down) ? up : down;
                sum += static_cast<int>(rem0[i] * down_factor);
            }

            // Rank differential coordinates.
            std::fill(rank.begin(), rank.end(), 0);
            for (int i = 0; i < d_; i++) {
                double di = elevated[i] - rem0[i];
                for (int j = i + 1; j <= d_; j++) {
                    if (di < elevated[j] - rem0[j])
                        rank[i]++;
                    else
                        rank[j]++;
                }
            }
            // Walk to the canonical simplex if sum != 0.
            if (sum > 0) {
                for (int i = 0; i <= d_; i++) {
                    if (rank[i] >= d_ + 1 - sum) {
                        rem0[i] -= d_ + 1;
                        rank[i] += sum - (d_ + 1);
                    } else {
                        rank[i] += sum;
                    }
                }
            } else if (sum < 0) {
                for (int i = 0; i <= d_; i++) {
                    if (rank[i] < -sum) {
                        rem0[i] += d_ + 1;
                        rank[i] += (d_ + 1) + sum;
                    } else {
                        rank[i] += sum;
                    }
                }
            }

            // Barycentric coordinates.
            std::fill(barycentric.begin(), barycentric.end(), 0.f);
            for (int i = 0; i <= d_; i++) {
                float v = (elevated[i] - rem0[i]) * down_factor;
                barycentric[d_ - rank[i]] += v;
                barycentric[d_ - rank[i] + 1] -= v;
            }
            barycentric[0] += 1.0f + barycentric[d_ + 1];

            // Register the d+1 simplex vertices (canonical coordinates).
            for (int remainder = 0; remainder <= d_; remainder++) {
                for (int i = 0; i < d_; i++) {
                    key[i] = static_cast<short>(rem0[i] + remainder);
                    if (rank[i] > d_ - remainder) key[i] -= (d_ + 1);
                }
                auto it = hash.find(key);
                int idx;
                if (it == hash.end()) {
                    idx = static_cast<int>(hash.size());
                    hash.emplace(key, idx);
                    keys_.insert(keys_.end(), key.begin(), key.end());
                } else {
                    idx = it->second;
                }
                offset_[p * (d_ + 1) + remainder] = idx;
                barycentric_[p * (d_ + 1) + remainder] =
                    barycentric[remainder];
            }
        }
        m_ = static_cast<int>(hash.size());

        // Blur neighbor table: for each lattice point and axis j, the
        // indices of its +/- neighbors along lattice direction j.
        blur_neighbors_.assign(static_cast<size_t>(2) * (d_ + 1) * m_, -1);
        std::vector<short> n1(d_), n2(d_);
        // rebuild the hash for lookup (hash already has all keys)
        for (int j = 0; j <= d_; j++) {
            for (int i = 0; i < m_; i++) {
                const short* k = &keys_[static_cast<size_t>(i) * d_];
                for (int c = 0; c < d_; c++) {
                    n1[c] = static_cast<short>(k[c] - 1);
                    n2[c] = static_cast<short>(k[c] + 1);
                }
                if (j < d_) {
                    n1[j] = static_cast<short>(k[j] + d_);
                    n2[j] = static_cast<short>(k[j] - d_);
                }
                auto i1 = hash.find(n1);
                auto i2 = hash.find(n2);
                blur_neighbors_[(static_cast<size_t>(j) * m_ + i) * 2 + 0] =
                    (i1 == hash.end()) ? -1 : i1->second;
                blur_neighbors_[(static_cast<size_t>(j) * m_ + i) * 2 + 1] =
                    (i2 == hash.end()) ? -1 : i2->second;
            }
        }
    }

    void filter(const float* values, int vd, float* out) {
        // Splat.
        std::vector<float> data(static_cast<size_t>(m_) * vd, 0.f);
        for (int p = 0; p < n_; p++) {
            for (int r = 0; r <= d_; r++) {
                int o = offset_[p * (d_ + 1) + r];
                float w = barycentric_[p * (d_ + 1) + r];
                for (int v = 0; v < vd; v++)
                    data[static_cast<size_t>(o) * vd + v] +=
                        w * values[static_cast<size_t>(p) * vd + v];
            }
        }
        // Blur along each lattice direction: [1 2 1] / 4... (the standard
        // lattice blur uses weights (n1 + 2*self + n2) / 4 per axis).
        std::vector<float> buf(data.size());
        for (int j = 0; j <= d_; j++) {
            for (int i = 0; i < m_; i++) {
                int i1 =
                    blur_neighbors_[(static_cast<size_t>(j) * m_ + i) * 2 + 0];
                int i2 =
                    blur_neighbors_[(static_cast<size_t>(j) * m_ + i) * 2 + 1];
                for (int v = 0; v < vd; v++) {
                    float c = data[static_cast<size_t>(i) * vd + v];
                    float l = i1 >= 0
                                  ? data[static_cast<size_t>(i1) * vd + v]
                                  : 0.f;
                    float r = i2 >= 0
                                  ? data[static_cast<size_t>(i2) * vd + v]
                                  : 0.f;
                    buf[static_cast<size_t>(i) * vd + v] =
                        0.5f * l + c + 0.5f * r;
                }
            }
            data.swap(buf);
        }
        // Slice (alpha corrects the blur gain, from the paper).
        float alpha = 1.0f / (1.0f + std::pow(2.0f, -d_));
        std::memset(out, 0, sizeof(float) * n_ * vd);
        for (int p = 0; p < n_; p++) {
            for (int r = 0; r <= d_; r++) {
                int o = offset_[p * (d_ + 1) + r];
                float w = barycentric_[p * (d_ + 1) + r];
                for (int v = 0; v < vd; v++)
                    out[static_cast<size_t>(p) * vd + v] +=
                        alpha * w * data[static_cast<size_t>(o) * vd + v];
            }
        }
    }

  private:
    int d_, n_, m_ = 0;
    std::vector<int> offset_;
    std::vector<float> barycentric_;
    std::vector<float> scale_factor_;
    std::vector<short> keys_;
    std::vector<int> blur_neighbors_;
};

}  // namespace

extern "C" {

// Filter `values` (n x vd) by the Gaussian kernel over `features` (n x fd).
void ph_filter(const float* features, int n, int fd, const float* values,
               int vd, float* out) {
    PermutohedralLattice lattice(fd, n);
    lattice.splat_setup(features);
    lattice.filter(values, vd, out);
}

// Dense-CRF mean field with Potts compatibilities and symmetric kernel
// normalization, exact permutohedral filtering.
//   probs: n x c initial probabilities (unary = -log p)
//   gauss_feat: n x 2 (pos/sigma), bilateral_feat: n x 5 (pos/sigma,
//   rgb/schan); out: n x c.
void ph_dense_crf(const float* probs, int n, int c, const float* gauss_feat,
                  float gauss_compat, const float* bilat_feat,
                  float bilat_compat, int iterations, float* out) {
    PermutohedralLattice lg(2, n), lb(5, n);
    lg.splat_setup(gauss_feat);
    lb.splat_setup(bilat_feat);

    std::vector<float> ones(n, 1.0f), ng(n), nb(n);
    lg.filter(ones.data(), 1, ng.data());
    lb.filter(ones.data(), 1, nb.data());
    for (int i = 0; i < n; i++) {
        ng[i] = 1.0f / std::sqrt(std::max(ng[i], 1e-20f));
        nb[i] = 1.0f / std::sqrt(std::max(nb[i], 1e-20f));
    }

    std::vector<float> u(static_cast<size_t>(n) * c);
    for (size_t i = 0; i < u.size(); i++)
        u[i] = -std::log(std::max(probs[i], 1e-8f));

    std::vector<float> q(u.size()), tmp(u.size()), fg(u.size()), fb(u.size());
    // init: softmax(-u)
    for (int i = 0; i < n; i++) {
        float mx = -u[static_cast<size_t>(i) * c];
        for (int l = 1; l < c; l++)
            mx = std::max(mx, -u[static_cast<size_t>(i) * c + l]);
        float s = 0;
        for (int l = 0; l < c; l++) {
            q[static_cast<size_t>(i) * c + l] =
                std::exp(-u[static_cast<size_t>(i) * c + l] - mx);
            s += q[static_cast<size_t>(i) * c + l];
        }
        for (int l = 0; l < c; l++) q[static_cast<size_t>(i) * c + l] /= s;
    }

    for (int it = 0; it < iterations; it++) {
        // normalized inputs
        for (int i = 0; i < n; i++)
            for (int l = 0; l < c; l++)
                tmp[static_cast<size_t>(i) * c + l] =
                    q[static_cast<size_t>(i) * c + l] * ng[i];
        lg.filter(tmp.data(), c, fg.data());
        for (int i = 0; i < n; i++)
            for (int l = 0; l < c; l++)
                tmp[static_cast<size_t>(i) * c + l] =
                    q[static_cast<size_t>(i) * c + l] * nb[i];
        lb.filter(tmp.data(), c, fb.data());

        for (int i = 0; i < n; i++) {
            float mx = -1e30f;
            for (int l = 0; l < c; l++) {
                float msg = gauss_compat * fg[static_cast<size_t>(i) * c + l] *
                                ng[i] +
                            bilat_compat * fb[static_cast<size_t>(i) * c + l] *
                                nb[i];
                tmp[static_cast<size_t>(i) * c + l] =
                    -u[static_cast<size_t>(i) * c + l] + msg;
                mx = std::max(mx, tmp[static_cast<size_t>(i) * c + l]);
            }
            float s = 0;
            for (int l = 0; l < c; l++) {
                q[static_cast<size_t>(i) * c + l] =
                    std::exp(tmp[static_cast<size_t>(i) * c + l] - mx);
                s += q[static_cast<size_t>(i) * c + l];
            }
            for (int l = 0; l < c; l++) q[static_cast<size_t>(i) * c + l] /= s;
        }
    }
    std::memcpy(out, q.data(), sizeof(float) * n * c);
}

}  // extern "C"
