// Native colour-space unpaired finalize + render.
//
// Consumes the flat outputs of the fused CS device launch (vector
// scores already consumed by pass1_select; here: the 4-layer full-SW
// packed rows + reverse-order step strings of the SELECTED hits) and
// performs, per read, the whole remaining gmapper pipeline:
//
//   post-SW rescoring      sw-post.c:639-757  (via cs_fb_one, cspost.cpp)
//   read_pass2 filtering   mapping.c:1631-1750, 1520-1606
//   unpaired MQVs          gmapper/output.c:777-793
//   SAM line assembly      hit_output, output.c:227-774 (CS flavour:
//                          SEQ = called letters, S->H clips, CS/CM/XX)
//
// Selections, numbers and SAM bytes are identical to the Python
// generic path (mapper._pass2_cs + _finalize + io/sam.py), which is
// itself golden-tested against gmapper-cs.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" void cs_fb_one(
    const int64_t *cols_let, const int64_t *cols_col,
    const double *cols_err, int64_t n, int init_bp,
    double la_match, double la_mis, double pr_snp,
    double *fw, double *bw, double *pri, double *fwscale,
    double *bwscale, double *total_out, double *post_out);

extern "C" {

struct CSFRParams {
  int64_t n_jobs;
  int64_t n_reads;
  int32_t read_len;       // R: colour count per read
  int32_t steps_words;    // columns of steps_rev
  int32_t read_seq_len;   // raw read string length (primer + colours)
  double sw_full_threshold;   // negative = absolute
  int32_t num_outputs;
  int32_t strata;
  int32_t max_alignments;
  int32_t single_best;
  int32_t compute_mqv;
  double alpha, beta;
  double pr_xover, pr_snp;
  double pr_del_open, pr_del_extend, pr_ins_open, pr_ins_extend;
  int64_t genome_len;
  const uint8_t* genome_fwd;   // letter planes (padded)
  const uint8_t* genome_rc;
  const uint32_t* contig_lengths;
  const int32_t* contig_name_off;
  const char* contig_names;
  const int64_t* name_off;     // [n_reads + 1]
  const char* names;
  const uint8_t* colours;      // [n_reads, R] colour codes, input strand
  const uint8_t* qr_tab;       // [n_reads, 4, R] letter layers
  const int32_t* initbp;       // [n_reads]
  const uint8_t* readseq;      // [n_reads, read_seq_len] raw chars
  // fastq extras (null quals -> quality-less flow)
  int32_t fastq;               // emit QUAL column + CQ:Z
  int32_t use_read_qvs;        // quals drive colour error rates
  int32_t qual_delta;
  int32_t use_sanger_qvs;
  const uint8_t* quals;        // [n_reads, R] scoring quality chars
  const uint8_t* cq;           // [n_reads, cq_len] raw chars for CQ:Z
  int32_t cq_len;
};

struct CSFRJobs {
  const int32_t* ri;
  const int32_t* cn;
  const int8_t* gen_st;
  const int64_t* g_off;       // normalized contig-local window start
  const int64_t* start_abs;   // normalized absolute plane offset
  const int64_t* score_max;
  const int16_t* packed;      // [n, 12] score bi bj bk nops rs gs m mm
                              //          ins dele xo
  const int8_t* steps_rev;    // [n, steps_words] op|lay<<2|xov<<4, rev
};

static inline int cs_qv_from_pr_corr(double pr_corr) {
  double pr_err = 1.0 - pr_corr;
  if (pr_err > .99999999) return 0;
  if (pr_err < 1e-25) return 250;
  return (int)(-10.0 * log(pr_err) / log(10.0));
}

// util.h:284-293
static inline double cs_pr_err_from_qv(int qv) {
  if (qv <= 0) return .99999999;
  if (qv >= 250) return 1e-25;
  return pow(10.0, -qv / 10.0);
}

static const char LS_CHARS[17] = "ACGTUMRWSYKVHDBN";
static const int CS_BASE_N = 15;

struct CSHit {
  int64_t job;
  int64_t key;
  int32_t score_full;
  int64_t pos;             // SAM POS
  int64_t gstart;          // contig-local alignment start
  double posterior;
  int mqv;
  int order;
  int rmapped;
  int matches, mismatches, crossovers;
  int16_t pk[12];
  // rendered strings (alignment order)
  std::vector<uint8_t> xx;       // qralign chars incl '-' and case
  std::vector<uint8_t> seq;      // called letters (upper, fwd order)
  std::vector<uint8_t> qual;     // post-SW base qualities (fastq only)
  std::vector<int32_t> cig_n;    // CIGAR runs, fwd order
  std::vector<char> cig_c;
  int64_t k1[3], k2[3];
};

int64_t cs_finalize_render(const CSFRParams* p, const CSFRJobs* j,
                           char* out_buf, int64_t out_cap,
                           int32_t* read_nhits) {
  const bool absolute = p->sw_full_threshold < 0;
  const double thr_pct = p->sw_full_threshold / 100.0;
  const double cc = 2.0 * p->alpha + p->beta;
  const double la_match = log(1 - p->pr_snp);
  const double la_mis = log(p->pr_snp / 3.0);
  const int R = p->read_len;
  const int W = p->steps_words;
  char* w = out_buf;
  char* end = out_buf + out_cap;

  for (int64_t r = 0; r < p->n_reads; r++) read_nhits[r] = 0;
  if (!p->compute_mqv) return -2;

  const int maxcols = W + 4;
  std::vector<int64_t> cols_let(maxcols), cols_col(maxcols);
  std::vector<double> cols_err(maxcols);
  std::vector<int32_t> col_db(maxcols);     // genome letter or -1
  std::vector<int32_t> base_call(maxcols);  // pre-rescoring call code
  std::vector<int8_t> step_op(W + 1);
  std::vector<int32_t> step_col(W + 1);     // column index or -1
  std::vector<double> fb_fw(maxcols * 16), fb_bw(maxcols * 16),
      fb_pri(maxcols * 16), fb_fws(maxcols), fb_bws(maxcols),
      fb_post(maxcols * 4);
  std::vector<CSHit> sv;
  sv.reserve(32);

  int64_t a = 0;
  while (a < p->n_jobs) {
    int64_t ri = j->ri[a];
    int64_t b = a;
    while (b < p->n_jobs && j->ri[b] == ri) b++;

    sv.clear();
    for (int64_t t = a; t < b; t++) {
      const int16_t* pk = j->packed + t * 12;
      int score = pk[0];
      if (score <= 0) continue;
      const int nops = pk[4];
      const int rs = pk[5], gs = pk[6];
      const int ins = pk[9], dele = pk[10];
      const int rmapped = nops - ins;
      const uint8_t* genome =
          (j->gen_st[t] ? p->genome_rc : p->genome_fwd);
      const int64_t gbase = j->start_abs[t];
      const uint8_t* rcol = p->colours + ri * R;
      const uint8_t* qr = p->qr_tab + ri * 4 * R;
      const int init_bp = p->initbp[ri];
      const int8_t* steps = j->steps_rev + t * W;

      // ---- column extraction (load_local_vectors, sw-post.c:472-551)
      const uint8_t* rqual =
          (p->use_read_qvs && p->quals) ? p->quals + ri * R : nullptr;
      int start_run = 0;
      int min_qv = 10000;
      for (int q = 0; q < rs; q++) {
        int c = rcol[q];
        if (c == CS_BASE_N) { start_run = CS_BASE_N; min_qv = 0; break; }
        start_run ^= c;
        if (rqual && (int)rqual[q] < min_qv) min_qv = rqual[q];
      }
      int ncol = 0;
      {
        int ii = rs, jj = gs;
        int nst = 0;
        for (int q = nops - 1; q >= 0; q--) {
          int s = steps[q];
          int op = s & 3;
          step_op[nst] = (int8_t)op;
          if (op == 1) {                 // genome-only: qralign '-'
            step_col[nst++] = -1;
            jj++;
            continue;
          }
          int gl = -1;
          if (op == 3) gl = genome[gbase + jj];
          cols_let[ncol] = (op == 3) ? (int64_t)gl : (int64_t)-1;
          col_db[ncol] = (op == 3) ? gl : -1;
          // base_call: the pre-rescoring letter (N calls take the
          // genome letter, sw-full-cs.c:1049)
          {
            int lay = (s >> 2) & 3;
            int bc = qr[lay * R + ii];
            if (op == 3 && bc == CS_BASE_N) bc = gl;
            base_call[ncol] = bc;
          }
          int c = rcol[ii];
          if ((ncol == 0 && start_run == CS_BASE_N) || c == CS_BASE_N) {
            cols_col[ncol] = 0;
            cols_err[ncol] = .75;
          } else {
            cols_col[ncol] = c ^ (ncol == 0 ? start_run : 0);
            if (rqual) {
              int qch = rqual[ii];
              if (ncol == 0 && min_qv < qch) qch = min_qv;
              double err = cs_pr_err_from_qv(qch - p->qual_delta);
              if (!p->use_sanger_qvs) err = err / (1 + err);
              if (err > .75) err = .75;
              cols_err[ncol] = err;
            } else {
              cols_err[ncol] = p->pr_xover;
            }
          }
          step_col[nst++] = ncol;
          ncol++;
          ii++;
          if (op == 3) jj++;
        }
      }
      if (ncol == 0) continue;

      // ---- forward-backward + posterior
      double total;
      cs_fb_one(cols_let.data(), cols_col.data(), cols_err.data(), ncol,
                init_bp, la_match, la_mis, p->pr_snp, fb_fw.data(),
                fb_bw.data(), fb_pri.data(), fb_fws.data(), fb_bws.data(),
                &total, fb_post.data());

      // ---- fix_base_calls (sw-post.c:554-590)
      CSHit h;
      h.xx.resize(nops);
      h.seq.resize(ncol);
      int matches = 0, mismatches = 0, crossovers = 0;
      {
        int prev = init_bp;
        for (int st = 0; st < nops; st++) {
          int ci = step_col[st];
          if (ci < 0) { h.xx[st] = '-'; continue; }
          const double* po = fb_post.data() + (int64_t)ci * 4;
          int crt = 0;
          for (int q = 1; q < 4; q++)
            if (po[q] > po[crt]) crt = q;
          char ch;
          if ((prev ^ crt) == (int)cols_col[ci]) {
            ch = LS_CHARS[crt];
          } else {
            ch = (char)(LS_CHARS[crt] + 32);  // tolower
            crossovers++;
          }
          h.xx[st] = (uint8_t)ch;
          h.seq[ci] = (uint8_t)LS_CHARS[crt];
          if (col_db[ci] >= 0) {
            if (col_db[ci] == crt) matches++; else mismatches++;
          }
          prev = crt;
        }
      }

      // ---- get_base_qualities (sw-post.c:591-609): from the
      // pre-rescoring base calls' posteriors
      if (p->fastq) {
        h.qual.resize(ncol);
        for (int k = 0; k < ncol; k++) {
          int bc = base_call[k];
          int tmp = 0;
          if (bc != CS_BASE_N && bc <= 3)
            tmp = cs_qv_from_pr_corr(fb_post[(int64_t)k * 4 + bc]);
          if (tmp > 40) tmp = 40;
          h.qual[k] = (uint8_t)(33 + tmp);
        }
      }

      // ---- get_posterior (sw-post.c:611-633): indel factors over the
      // alignment strings; dbalign '-' == read-only step (op 2)
      double res = exp(-total);
      for (int st = 0; st < nops; st++) {
        if (step_op[st] == 2) {
          res *= p->pr_ins_extend;
          if (st == 0 || step_op[st - 1] != 2) res *= p->pr_ins_open;
        } else if (step_op[st] == 1) {
          res *= p->pr_del_extend;
          if (st == 0 || step_op[st - 1] != 1) res *= p->pr_del_open;
        }
      }

      // posterior_score (mapping.c:1609-1625; Python round = half-even)
      double psd = p->alpha * log2(res) + (double)rmapped * cc;
      long ps = (long)nearbyint(psd);
      if (ps < 0) ps = 0;
      int64_t smax = j->score_max[t];
      double thresh = absolute ? -p->sw_full_threshold
                               : thr_pct * (double)smax;
      if ((double)ps < thresh) continue;

      h.job = t;
      h.score_full = (int32_t)ps;
      h.key = absolute ? ps : (1000LL * 100LL * ps) / smax;
      h.posterior = res;
      h.order = (int)(t - a);
      h.rmapped = rmapped;
      h.matches = matches;
      h.mismatches = mismatches;
      h.crossovers = crossovers;
      memcpy(h.pk, pk, 12 * sizeof(int16_t));
      h.gstart = (int64_t)gs + j->g_off[t];
      h.k1[0] = j->cn[t]; h.k1[1] = j->gen_st[t]; h.k1[2] = h.gstart;
      h.k2[0] = j->cn[t]; h.k2[1] = j->gen_st[t];
      h.k2[2] = -h.gstart - rmapped + dele - ins;

      // ---- CIGAR runs (make_cigar output.c:15-64, S->H for CS
      // output.c:575-579), forward order; emission reverses for rev
      {
        if (rs > 0) { h.cig_n.push_back(rs); h.cig_c.push_back('H'); }
        int prevop = -1, cnt = 0;
        for (int st = 0; st < nops; st++) {
          int op = step_op[st];
          if (op == prevop) { cnt++; continue; }
          if (cnt) {
            h.cig_n.push_back(cnt);
            h.cig_c.push_back(prevop == 2 ? 'I'
                              : (prevop == 1 ? 'D' : 'M'));
          }
          prevop = op;
          cnt = 1;
        }
        if (cnt) {
          h.cig_n.push_back(cnt);
          h.cig_c.push_back(prevop == 2 ? 'I'
                            : (prevop == 1 ? 'D' : 'M'));
        }
        int read_end1 = rs + rmapped;
        if (read_end1 != R) {
          h.cig_n.push_back(R - read_end1);
          h.cig_c.push_back('H');
        }
      }
      sv.push_back(std::move(h));
    }

    if (sv.size() > 1) {
      for (int pass = 0; pass < 2; pass++) {
        std::stable_sort(sv.begin(), sv.end(),
                         [pass](const CSHit& x, const CSHit& y) {
          const int64_t* kx = pass ? x.k2 : x.k1;
          const int64_t* ky = pass ? y.k2 : y.k1;
          if (kx[0] != ky[0]) return kx[0] < ky[0];
          if (kx[1] != ky[1]) return kx[1] < ky[1];
          return kx[2] < ky[2];
        });
        std::vector<CSHit> outv;
        size_t i = 0;
        while (i < sv.size()) {
          size_t g = i, best = i;
          auto eq = [pass](const CSHit& x, const CSHit& y) {
            const int64_t* kx = pass ? x.k2 : x.k1;
            const int64_t* ky = pass ? y.k2 : y.k1;
            return kx[0] == ky[0] && kx[1] == ky[1] && kx[2] == ky[2];
          };
          while (g + 1 < sv.size() && eq(sv[g + 1], sv[i])) {
            g++;
            if (sv[g].key > sv[best].key) best = g;
          }
          outv.push_back(std::move(sv[best]));
          i = g + 1;
        }
        sv.swap(outv);
      }
      std::stable_sort(sv.begin(), sv.end(),
                       [](const CSHit& x, const CSHit& y) {
                         return x.key > y.key;
                       });
    }
    if ((int64_t)sv.size() > p->num_outputs) sv.resize(p->num_outputs);
    if (p->strata && !sv.empty()) {
      size_t i = 1;
      while (i < sv.size() && sv[0].score_full == sv[i].score_full) i++;
      sv.resize(i);
    }
    if (p->max_alignments > 0 && (int64_t)sv.size() > p->max_alignments)
      sv.clear();

    if (!sv.empty()) {
      double z1 = 0.0;
      for (auto& s : sv) z1 += s.posterior;
      for (auto& s : sv) {
        s.mqv = cs_qv_from_pr_corr(s.posterior / z1);
        if (s.mqv < 4) s.mqv = 0;
      }
      if (p->single_best && sv.size() > 1) {
        size_t best = 0;
        for (size_t i = 1; i < sv.size(); i++)
          if (sv[i].mqv > sv[best].mqv) best = i;
        CSHit b2 = std::move(sv[best]);
        sv.clear();
        sv.push_back(std::move(b2));
      }
      for (auto& s : sv) {
        int64_t t = s.job;
        bool rev = j->gen_st[t] != 0;
        const int rs = s.pk[5];
        const int ins = s.pk[9], dele = s.pk[10];
        int read_end1 = rs + s.rmapped;
        int64_t glen_c = (int64_t)p->contig_lengths[j->cn[t]];
        int64_t pos;
        if (!rev) {
          pos = s.gstart + 1;
        } else {
          int64_t right = glen_c - s.gstart;
          pos = right - (read_end1 - (rs + 1) - dele + ins);
        }
        int64_t nl = p->name_off[ri + 1] - p->name_off[ri];
        int64_t need = 512 + nl + (int64_t)s.xx.size() + s.seq.size()
                       + s.qual.size() + (int64_t)p->read_seq_len
                       + p->cq_len + 12 * (int64_t)s.cig_n.size();
        if (end - w < need) return -1;
        memcpy(w, p->names + p->name_off[ri], nl);
        w += nl;
        w += sprintf(w, "\t%d\t", rev ? 0x10 : 0);
        int32_t cn = j->cn[t];
        int32_t cl = p->contig_name_off[cn + 1] - p->contig_name_off[cn];
        memcpy(w, p->contig_names + p->contig_name_off[cn], cl);
        w += cl;
        w += sprintf(w, "\t%lld\t%d\t", (long long)pos, s.mqv);
        if (!rev) {
          for (size_t q = 0; q < s.cig_n.size(); q++)
            w += sprintf(w, "%d%c", s.cig_n[q], s.cig_c[q]);
        } else {
          for (size_t q = s.cig_n.size(); q-- > 0;)
            w += sprintf(w, "%d%c", s.cig_n[q], s.cig_c[q]);
        }
        memcpy(w, "\t*\t0\t0\t", 7);
        w += 7;
        // SEQ: called letters; revcomp on the reverse strand
        if (!rev) {
          memcpy(w, s.seq.data(), s.seq.size());
          w += s.seq.size();
        } else {
          static const char comp[5] = "TGCA";
          for (size_t q = s.seq.size(); q-- > 0;) {
            uint8_t c = s.seq[q];
            int code = (c == 'A') ? 0 : (c == 'C') ? 1
                       : (c == 'G') ? 2 : 3;
            *w++ = comp[code];
          }
        }
        *w++ = '\t';
        if (p->fastq && !s.qual.empty()) {
          // post-SW base qualities, strand-oriented (output.c:613-622)
          if (!rev) {
            memcpy(w, s.qual.data(), s.qual.size());
            w += s.qual.size();
          } else {
            for (size_t q = s.qual.size(); q-- > 0;)
              *w++ = (char)s.qual[q];
          }
        } else {
          *w++ = '*';
        }
        w += sprintf(w, "\tAS:i:%d", s.score_full);
        w += sprintf(w, "\tZ0:i:%d\tZ1:i:%d",
                     (int)(1000.0 * -log(s.posterior)),
                     (int)(1000.0 * -log(z1)));
        w += sprintf(w, "\tNM:i:%d", s.mismatches + dele + ins);
        if (p->fastq && p->cq) {
          // CQ:Z raw colour quality string (output.c:688-690)
          memcpy(w, "\tCQ:Z:", 6);
          w += 6;
          memcpy(w, p->cq + (int64_t)ri * p->cq_len, p->cq_len);
          w += p->cq_len;
        }
        // CS:Z raw read, CM:i crossovers, XX:Z rewritten qralign
        memcpy(w, "\tCS:Z:", 6);
        w += 6;
        memcpy(w, p->readseq + ri * p->read_seq_len, p->read_seq_len);
        w += p->read_seq_len;
        w += sprintf(w, "\tCM:i:%d", s.crossovers);
        memcpy(w, "\tXX:Z:", 6);
        w += 6;
        memcpy(w, s.xx.data(), s.xx.size());
        w += s.xx.size();
        *w++ = '\n';
      }
      read_nhits[ri] = (int32_t)sv.size();
    }
    a = b;
  }
  return w - out_buf;
}

}  // extern "C"
