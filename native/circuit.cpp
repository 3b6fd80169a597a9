// Native circuit compiler: branch enumeration + hash-consed micro-op DAG +
// level scheduling, the C++ runtime twin of fhe_regex_tpu/regex/{engine,
// circuit}.py (which themselves mirror the reference's engine.rs:45-214 and
// execution.rs:37-222).  Exposed via a C ABI for ctypes.
//
// Semantics contract (tested byte-exact against the Python builder):
//   - identical branch enumeration and ordering (Q6-Q8, Q12, Q15)
//   - identical Executed-expression cache keys, trivial-constant
//     short-circuits (Q10) and ct_ops/cache_hits counters in strict mode
//   - identical flat-set collection + balanced 3-ary materialization in
//     opt mode
//
// AST wire format (int32 pre-order):
//   SOF=0 | EOF=1 | CHAR=2 c | ANY=3 | BETWEEN=4 from to | RANGE=5 k c...
//   NOT=6 sub | EITHER=7 l r | OPTIONAL=8 sub |
//   REPEATED=9 least+1|0 most+1|0 sub | SEQ=10 k subs...

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <map>
#include <memory>
#include <unordered_map>
#include <vector>
#include <algorithm>

namespace {

// ---------------- AST ----------------

struct Ast {
    int tag;
    int a = 0, b = 0;
    std::vector<int> cs;
    std::vector<const Ast*> kids;   // non-owning; arena owns all nodes
};

using Arena = std::vector<std::unique_ptr<Ast>>;

const Ast* parse_ast(const int32_t*& p, Arena& arena) {
    auto node = std::make_unique<Ast>();
    Ast* n = node.get();
    arena.push_back(std::move(node));
    n->tag = *p++;
    switch (n->tag) {
        case 2: n->a = *p++; break;                       // CHAR
        case 4: n->a = *p++; n->b = *p++; break;          // BETWEEN
        case 5: {                                          // RANGE
            int k = *p++;
            for (int i = 0; i < k; i++) n->cs.push_back(*p++);
            break;
        }
        case 6: case 8: n->kids.push_back(parse_ast(p, arena)); break;
        case 7:                                            // EITHER
            n->kids.push_back(parse_ast(p, arena));
            n->kids.push_back(parse_ast(p, arena));
            break;
        case 9:                                            // REPEATED
            n->a = *p++; n->b = *p++;
            n->kids.push_back(parse_ast(p, arena));
            break;
        case 10: {                                         // SEQ
            int k = *p++;
            for (int i = 0; i < k; i++) n->kids.push_back(parse_ast(p, arena));
            break;
        }
        default: break;                                    // SOF/EOF/ANY
    }
    return n;
}

// ---------------- Executed expression interning ----------------
// tags: CONST=0(c) CTPOS=1(at) AND=2 OR=3 EQ=4 GE=5 LE=6 NOT=7

struct ExprKey {
    int tag, a, b;
    bool operator==(const ExprKey& o) const {
        return tag == o.tag && a == o.a && b == o.b;
    }
};
struct ExprKeyHash {
    size_t operator()(const ExprKey& k) const {
        return std::hash<uint64_t>()(
            (uint64_t)k.tag * 1000003u ^ ((uint64_t)(uint32_t)k.a << 20) ^
            (uint64_t)(uint32_t)k.b * 2654435761u);
    }
};

// ---------------- LUT identities ----------------
// kind: EQ=0(c) GT=1(c) LT=2(c) LE=3(c) AND2=4 OR2=5 AND3=6 OR3=7 ORAND3=8

struct BitVal {
    int konst;   // value = konst + sign * slot
    int sign;    // 0, +1, -1
    int slot;    // -1 if none
    bool operator==(const BitVal& o) const {
        return konst == o.konst && sign == o.sign && slot == o.slot;
    }
};
BitVal bv_const(int c) { return {c, 0, -1}; }
BitVal bv_slot(int s) { return {0, 1, s}; }
BitVal bv_neg(BitVal v) { return {1 - v.konst, -v.sign, v.slot}; }

struct Value {              // BitVal or pending flat gate
    bool pending = false;
    int kind = 0;           // 0=and 1=or (pending only)
    BitVal bit{0, 0, -1};
    std::shared_ptr<std::vector<BitVal>> elems;  // sorted (pending only)
};

struct NodeV {
    int expr;               // interned expr id
    Value val;
};

struct PbsOpC {
    int in_slots[3];
    int in_coefs[3];
    int konst;
    int lut_kind, lut_c;
    int out_slot;
    int level;
};

struct Builder {
    int content_len, num_blocks, mode;  // mode: 0 strict, 1 opt
    int num_content_slots;
    std::vector<PbsOpC> ops;
    std::vector<ExprKey> exprs;
    std::unordered_map<ExprKey, int, ExprKeyHash> intern;
    std::unordered_map<ExprKey, Value, ExprKeyHash> cache;  // keyed by expr key
    std::map<std::vector<int64_t>, std::pair<int, int>> microcache;
    std::map<std::vector<int64_t>, BitVal> pendcache;
    std::vector<int> slot_level;
    int64_t ct_ops = 0, cache_hits = 0;

    Builder(int len, int blocks, int m)
        : content_len(len), num_blocks(blocks), mode(m),
          num_content_slots(1 + len * blocks) {}

    int intern_expr(int tag, int a, int b) {
        ExprKey k{tag, a, b};
        auto it = intern.find(k);
        if (it != intern.end()) return it->second;
        int id = (int)exprs.size();
        exprs.push_back(k);
        intern.emplace(k, id);
        return id;
    }
    int expr_const(int c) { return intern_expr(0, c, 0); }
    int expr_ctpos(int at) { return intern_expr(1, at, 0); }
    bool is_const(int e, int c) {
        return exprs[e].tag == 0 && exprs[e].a == c;
    }

    int content_slot(int at, int block) {
        return 1 + at * num_blocks + block;
    }
    int level_of(int s) {
        return (s >= 0 && s < (int)slot_level.size()) ? slot_level[s] : 0;
    }

    int emit_pbs(std::vector<std::pair<int, int>> ins, int konst,
                 int lut_kind, int lut_c) {
        std::sort(ins.begin(), ins.end());
        std::vector<int64_t> key;
        for (auto& p : ins) { key.push_back(p.first); key.push_back(p.second); }
        key.push_back(1LL << 40);  // separator
        key.push_back(konst); key.push_back(lut_kind); key.push_back(lut_c);
        auto it = microcache.find(key);
        if (it != microcache.end()) return it->second.first;
        int level = 1;
        for (auto& p : ins) level = std::max(level, 1 + level_of(p.first));
        if (ins.empty()) level = 1;
        PbsOpC op{};
        for (int i = 0; i < 3; i++) {
            op.in_slots[i] = i < (int)ins.size() ? ins[i].first : 0;
            op.in_coefs[i] = i < (int)ins.size() ? ins[i].second : 0;
        }
        op.konst = konst; op.lut_kind = lut_kind; op.lut_c = lut_c;
        op.level = level;
        int out = num_content_slots + (int)ops.size();
        op.out_slot = out;
        ops.push_back(op);
        if ((int)slot_level.size() <= out) slot_level.resize(out + 1, 0);
        slot_level[out] = level;
        microcache.emplace(std::move(key), std::make_pair(out, level));
        return out;
    }

    // affine combine of scaled bits
    void bit_ins(const std::vector<std::pair<BitVal, int>>& bits,
                 std::vector<std::pair<int, int>>& ins, int& konst) {
        konst = 0;
        for (auto& [bvv, scale] : bits) {
            konst += scale * bvv.konst;
            if (bvv.sign != 0) ins.push_back({bvv.slot, scale * bvv.sign});
        }
    }

    NodeV with_cache(int tag, int ea, int eb, Value (Builder::*run)(int, int),
                     int ra, int rb) {
        int expr = intern_expr(tag, ea, eb);
        ExprKey k = exprs[expr];
        auto it = cache.find(k);
        if (it != cache.end()) { cache_hits++; return {expr, it->second}; }
        ct_ops++;
        Value v = (this->*run)(ra, rb);
        cache.emplace(k, v);
        return {expr, v};
    }

    Value run_eq(int at, int c) {
        auto pairv = [&](int b0, int b1) {
            std::vector<std::pair<int, int>> ins = {
                {content_slot(at, b0), 1}, {content_slot(at, b1), 4}};
            std::sort(ins.begin(), ins.end());
            return ins;
        };
        int s_lo = emit_pbs(pairv(0, 1), 0, 0, c & 0xF);
        int s_hi = emit_pbs(pairv(2, 3), 0, 0, (c >> 4) & 0xF);
        int s = emit_pbs({{s_lo, 1}, {s_hi, 2}}, 0, 4, 0);
        Value v; v.bit = bv_slot(s); return v;
    }
    Value run_ge(int at, int c) {  // strict gt (Q1)
        std::vector<std::pair<int, int>> lo = {
            {content_slot(at, 0), 1}, {content_slot(at, 1), 4}};
        std::vector<std::pair<int, int>> hi = {
            {content_slot(at, 2), 1}, {content_slot(at, 3), 4}};
        int gt_hi = emit_pbs(hi, 0, 1, (c >> 4) & 0xF);
        int eq_hi = emit_pbs(hi, 0, 0, (c >> 4) & 0xF);
        int gt_lo = emit_pbs(lo, 0, 1, c & 0xF);
        int s = emit_pbs({{gt_hi, 1}, {eq_hi, 2}, {gt_lo, 4}}, 0, 8, 0);
        Value v; v.bit = bv_slot(s); return v;
    }
    Value run_le(int at, int c) {
        std::vector<std::pair<int, int>> lo = {
            {content_slot(at, 0), 1}, {content_slot(at, 1), 4}};
        std::vector<std::pair<int, int>> hi = {
            {content_slot(at, 2), 1}, {content_slot(at, 3), 4}};
        int lt_hi = emit_pbs(hi, 0, 2, (c >> 4) & 0xF);
        int eq_hi = emit_pbs(hi, 0, 0, (c >> 4) & 0xF);
        int le_lo = emit_pbs(lo, 0, 3, c & 0xF);
        int s = emit_pbs({{lt_hi, 1}, {eq_hi, 2}, {le_lo, 4}}, 0, 8, 0);
        Value v; v.bit = bv_slot(s); return v;
    }

    NodeV ct_constant(int c) {
        Value v; v.bit = bv_const(c);
        return {expr_const(c), v};
    }
    NodeV ct_true() { return ct_constant(1); }
    NodeV ct_false() { return ct_constant(0); }

    NodeV ct_eq(int at, int c) {
        return with_cache(4, expr_ctpos(at), expr_const(c), &Builder::run_eq,
                          at, c);
    }
    NodeV ct_ge(int at, int c) {
        return with_cache(5, expr_ctpos(at), expr_const(c), &Builder::run_ge,
                          at, c);
    }
    NodeV ct_le(int at, int c) {
        return with_cache(6, expr_ctpos(at), expr_const(c), &Builder::run_le,
                          at, c);
    }

    BitVal materialize(int kind, const std::vector<BitVal>& elems) {
        std::vector<int64_t> key{kind};
        for (auto& e : elems) {
            key.push_back(e.slot); key.push_back(e.sign); key.push_back(e.konst);
        }
        auto it = pendcache.find(key);
        if (it != pendcache.end()) return it->second;
        std::vector<BitVal> lst = elems;
        while (lst.size() > 1) {
            std::stable_sort(lst.begin(), lst.end(),
                             [&](const BitVal& x, const BitVal& y) {
                                 int lx = x.slot >= 0 ? level_of(x.slot) : 0;
                                 int ly = y.slot >= 0 ? level_of(y.slot) : 0;
                                 return lx < ly;
                             });
            std::vector<BitVal> nxt;
            for (size_t i = 0; i < lst.size(); i += 3) {
                size_t n = std::min<size_t>(3, lst.size() - i);
                if (n == 1) { nxt.push_back(lst[i]); continue; }
                std::vector<std::pair<BitVal, int>> bits;
                int scales[3] = {1, 2, 4};
                for (size_t j = 0; j < n; j++)
                    bits.push_back({lst[i + j], scales[j]});
                std::vector<std::pair<int, int>> ins;
                int konst;
                bit_ins(bits, ins, konst);
                ct_ops++;
                int lut = n == 3 ? (kind == 0 ? 6 : 7) : (kind == 0 ? 4 : 5);
                nxt.push_back(bv_slot(emit_pbs(ins, konst, lut, 0)));
            }
            lst = std::move(nxt);
        }
        pendcache.emplace(std::move(key), lst[0]);
        return lst[0];
    }

    BitVal force(const Value& v) {
        if (!v.pending) return v.bit;
        return materialize(v.kind, *v.elems);
    }

    Value merge_gate(int kind, const Value& a, const Value& b) {
        std::vector<BitVal> elems;
        for (const Value* v : {&a, &b}) {
            if (v->pending) {
                if (v->kind == kind)
                    elems.insert(elems.end(), v->elems->begin(), v->elems->end());
                else
                    elems.push_back(materialize(v->kind, *v->elems));
            } else {
                elems.push_back(v->bit);
            }
        }
        int dominant = kind == 0 ? 0 : 1;
        std::vector<BitVal> out;
        std::map<std::tuple<int, int, int>, bool> seen;
        for (auto& e : elems) {
            if (e.sign == 0) {
                if (e.konst == dominant) { Value r; r.bit = bv_const(dominant); return r; }
                continue;
            }
            auto k = std::make_tuple(e.slot, e.sign, e.konst);
            auto nk = std::make_tuple(e.slot, -e.sign, 1 - e.konst);
            if (seen.count(nk)) { Value r; r.bit = bv_const(dominant); return r; }
            if (seen.count(k)) continue;
            seen[k] = true;
            out.push_back(e);
        }
        if (out.empty()) { Value r; r.bit = bv_const(1 - dominant); return r; }
        if (out.size() == 1) { Value r; r.bit = out[0]; return r; }
        std::sort(out.begin(), out.end(), [](const BitVal& x, const BitVal& y) {
            return std::make_tuple(x.slot, x.sign, x.konst) <
                   std::make_tuple(y.slot, y.sign, y.konst);
        });
        Value r; r.pending = true; r.kind = kind;
        r.elems = std::make_shared<std::vector<BitVal>>(std::move(out));
        return r;
    }

    NodeV gate(int kind, const NodeV& a, const NodeV& b) {  // kind 0=and 1=or
        int tag = kind == 0 ? 2 : 3;
        int expr = intern_expr(tag, a.expr, b.expr);
        if (mode == 1) return {expr, merge_gate(kind, a.val, b.val)};
        // strict short-circuits (Q10)
        if (kind == 0) {
            if (is_const(a.expr, 1)) return {expr, b.val};
            if (is_const(a.expr, 0)) return {expr, a.val};
            if (is_const(b.expr, 1)) return {expr, a.val};
            if (is_const(b.expr, 0)) return {expr, b.val};
        } else {
            if (is_const(a.expr, 1)) return {expr, a.val};
            if (is_const(b.expr, 1)) return {expr, b.val};
            if (is_const(a.expr, 0) && is_const(b.expr, 0)) return {expr, a.val};
        }
        ExprKey k = exprs[expr];
        auto it = cache.find(k);
        if (it != cache.end()) { cache_hits++; return {expr, it->second}; }
        ct_ops++;
        std::vector<std::pair<int, int>> ins;
        int konst;
        bit_ins({{a.val.bit, 1}, {b.val.bit, 2}}, ins, konst);
        Value v; v.bit = bv_slot(emit_pbs(ins, konst, kind == 0 ? 4 : 5, 0));
        cache.emplace(k, v);
        return {expr, v};
    }

    NodeV ct_not(const NodeV& a) {
        int expr = intern_expr(7, a.expr, 0);
        ExprKey k = exprs[expr];
        auto it = cache.find(k);
        if (it != cache.end()) { cache_hits++; return {expr, it->second}; }
        ct_ops++;
        Value v; v.bit = bv_neg(force(a.val));
        cache.emplace(k, v);
        return {expr, v};
    }
};

// ---------------- lazy branch trees (engine.rs:45-214) ----------------

struct Lazy;
using LazyP = std::shared_ptr<Lazy>;
struct Lazy {
    enum Kind { TRUE, EQ, BETWEEN, RANGE, NOTW, AND } kind;
    int at = 0, a = 0, b = 0;
    std::vector<int> cs;
    LazyP l, r;
};

// Branch budget: one unit per Lazy node allocated — the same metric the
// Python engine charges per lazy closure, so both engines accept/reject
// a (pattern, content_len, budget) triple identically.
struct BranchBudgetExceeded {};
struct Budget {
    int64_t remaining;      // < 0: unlimited
    void charge() {
        if (remaining < 0) return;
        if (--remaining < 0) throw BranchBudgetExceeded{};
    }
};

NodeV run_lazy(Builder& bld, const Lazy* z) {
    switch (z->kind) {
        case Lazy::TRUE: return bld.ct_true();
        case Lazy::EQ: return bld.ct_eq(z->at, z->a);
        case Lazy::BETWEEN: {
            NodeV ge = bld.ct_ge(z->at, z->a);
            NodeV le = bld.ct_le(z->at, z->b);
            return bld.gate(0, ge, le);
        }
        case Lazy::RANGE: {
            NodeV res = bld.ct_eq(z->at, z->cs[0]);
            for (size_t i = 1; i < z->cs.size(); i++) {
                NodeV e = bld.ct_eq(z->at, z->cs[i]);
                res = bld.gate(1, res, e);
            }
            return res;
        }
        case Lazy::NOTW: {
            NodeV s = run_lazy(bld, z->l.get());
            return bld.ct_not(s);
        }
        case Lazy::AND: {
            NodeV p = run_lazy(bld, z->l.get());
            NodeV x = run_lazy(bld, z->r.get());
            return bld.gate(0, p, x);
        }
    }
    return bld.ct_false();
}

LazyP mk(Lazy::Kind k, Budget& bu) {
    bu.charge();
    auto p = std::make_shared<Lazy>(); p->kind = k; return p;
}

using Branch = std::pair<LazyP, int>;

void build_branches(int content_len, const Ast* re, int c_pos,
                    std::vector<Branch>& out, Budget& bu) {
    switch (re->tag) {
        case 0:  // SOF
            if (c_pos == 0) out.push_back({mk(Lazy::TRUE, bu), c_pos});
            return;
        case 1:  // EOF
            if (c_pos == content_len) out.push_back({mk(Lazy::TRUE, bu), c_pos});
            return;
        default: break;
    }
    if (c_pos >= content_len) return;   // Q15 prune
    switch (re->tag) {
        case 2: {  // CHAR
            auto z = mk(Lazy::EQ, bu); z->at = c_pos; z->a = re->a;
            out.push_back({z, c_pos + 1});
            return;
        }
        case 3:   // ANY
            out.push_back({mk(Lazy::TRUE, bu), c_pos + 1});
            return;
        case 6: {  // NOT
            std::vector<Branch> sub;
            build_branches(content_len, re->kids[0], c_pos, sub, bu);
            for (auto& [z, p] : sub) {
                auto w = mk(Lazy::NOTW, bu); w->l = z;
                out.push_back({w, p});
            }
            return;
        }
        case 7:   // EITHER
            build_branches(content_len, re->kids[0], c_pos, out, bu);
            build_branches(content_len, re->kids[1], c_pos, out, bu);
            return;
        case 4: {  // BETWEEN
            auto z = mk(Lazy::BETWEEN, bu); z->at = c_pos; z->a = re->a; z->b = re->b;
            out.push_back({z, c_pos + 1});
            return;
        }
        case 5: {  // RANGE
            auto z = mk(Lazy::RANGE, bu); z->at = c_pos; z->cs = re->cs;
            out.push_back({z, c_pos + 1});
            return;
        }
        case 9: {  // REPEATED
            int at_least = re->a > 0 ? re->a - 1 : 0;
            int at_most = re->b > 0 ? re->b - 1 : content_len - c_pos;
            if (at_least > at_most) return;
            std::vector<std::vector<Branch>> groups;
            groups.emplace_back();
            if (at_least == 0) groups.back().push_back({mk(Lazy::TRUE, bu), c_pos});
            // seed: Seq of max(1, at_least) aliases of the repeated sub-AST
            Ast seed;
            seed.tag = 10;
            seed.kids.assign(std::max(1, at_least), re->kids[0]);
            std::vector<Branch> g;
            build_branches(content_len, &seed, c_pos, g, bu);
            groups.push_back(std::move(g));
            for (int rep = at_least + 1; rep <= at_most; rep++) {
                std::vector<Branch> nxt;
                for (auto& [bp, pp] : groups.back()) {
                    std::vector<Branch> ext;
                    build_branches(content_len, re->kids[0], pp, ext, bu);
                    for (auto& [bx, px] : ext) {
                        auto w = mk(Lazy::AND, bu); w->l = bp; w->r = bx;
                        nxt.push_back({w, px});
                    }
                }
                groups.push_back(std::move(nxt));
            }
            for (auto& grp : groups)
                for (auto& br : grp) out.push_back(br);
            return;
        }
        case 8: {  // OPTIONAL
            build_branches(content_len, re->kids[0], c_pos, out, bu);
            out.push_back({mk(Lazy::TRUE, bu), c_pos});
            return;
        }
        case 10: {  // SEQ
            if (re->kids.empty()) return;  // Q13: error upstream in Python
            std::vector<Branch> cont;
            build_branches(content_len, re->kids[0], c_pos, cont, bu);
            for (size_t i = 1; i < re->kids.size(); i++) {
                std::vector<Branch> nxt;
                for (auto& [bp, pp] : cont) {
                    std::vector<Branch> ext;
                    build_branches(content_len, re->kids[i], pp, ext, bu);
                    for (auto& [bx, px] : ext) {
                        auto w = mk(Lazy::AND, bu); w->l = bp; w->r = bx;
                        nxt.push_back({w, px});
                    }
                }
                cont = std::move(nxt);
            }
            for (auto& br : cont) out.push_back(br);
            return;
        }
        default: return;
    }
}

struct CompileResult {
    std::vector<PbsOpC> ops;
    int64_t ct_ops, cache_hits;
    int root_const, root_sign, root_slot;
    int num_slots;
};

// OR-fold an enumerated branch list (engine.rs:22-35; empty -> trivial
// FALSE, Q8) — the C++ twin of engine.py::_fold_branches.
NodeV fold_branches(Builder& bld, const std::vector<Branch>& branches) {
    if (branches.empty()) return bld.ct_false();
    NodeV res = run_lazy(bld, branches[0].first.get());
    for (size_t i = 1; i < branches.size(); i++) {
        NodeV br = run_lazy(bld, branches[i].first.get());
        res = bld.gate(1, res, br);
    }
    return res;
}

// Enumerate one pattern's branches and OR-fold them on a (possibly shared)
// builder — the C++ twin of engine.py::_fold_pattern.  Throws
// BranchBudgetExceeded.
NodeV fold_pattern(Builder& bld, const Ast* re, int content_len, Budget& bu) {
    std::vector<Branch> branches;
    for (int i = 0; i < content_len; i++)
        build_branches(content_len, re, i, branches, bu);
    return fold_branches(bld, branches);
}

void write_ops(int64_t* q, const Builder& bld) {
    for (auto& op : bld.ops) {
        for (int i = 0; i < 3; i++) *q++ = op.in_slots[i];
        for (int i = 0; i < 3; i++) *q++ = op.in_coefs[i];
        *q++ = op.konst;
        *q++ = op.lut_kind;
        *q++ = op.lut_c;
        *q++ = op.out_slot;
        *q++ = op.level;
    }
}

// Multi-root result blob (circuit_compile_multi / circuit_compile_positions
// share this layout; decoded by regex/native.py::_multiroot_from_blob):
// int64 header [n_ops, ct_ops, cache_hits, n_roots, num_content_slots] then
// n_roots x (const, sign, slot) triples, then the 11-int64 op records.
int64_t* write_multiroot_blob(const Builder& bld,
                              const std::vector<BitVal>& roots) {
    size_t n = bld.ops.size();
    size_t nr = roots.size();
    int64_t* out =
        (int64_t*)std::malloc((5 + nr * 3 + n * 11) * sizeof(int64_t));
    out[0] = (int64_t)n;
    out[1] = bld.ct_ops;
    out[2] = bld.cache_hits;
    out[3] = (int64_t)nr;
    out[4] = bld.num_content_slots;
    int64_t* q = out + 5;
    for (auto& r : roots) {
        *q++ = r.konst;
        *q++ = r.sign;
        *q++ = r.slot;
    }
    write_ops(q, bld);
    return out;
}

int64_t* budget_exceeded_blob() {
    int64_t* out = (int64_t*)std::calloc(5, sizeof(int64_t));
    out[0] = -1;
    return out;
}

}  // namespace

extern "C" {

// Compile a match circuit.  Returns a malloc'd result blob the caller frees
// with circuit_free.  Layout: int64 header [n_ops, ct_ops, cache_hits,
// root_const, root_sign, root_slot, num_content_slots] then n_ops records of
// 10 int64: in_slots[3], in_coefs[3], const, lut_kind, lut_c, out_slot, level
// -> 11 int64 each.
// branch_budget < 0 is unlimited; on exceed the blob header is [-1, ...].
int64_t* circuit_compile(const int32_t* ast, int32_t ast_len,
                         int32_t content_len, int32_t num_blocks,
                         int32_t mode /*0 strict, 1 opt*/,
                         int64_t branch_budget) {
    const int32_t* p = ast;
    Arena arena;
    const Ast* re = parse_ast(p, arena);
    (void)ast_len;

    Budget bu{branch_budget < 0 ? -1 : branch_budget};
    Builder bld(content_len, num_blocks, mode);
    NodeV res{};
    try {
        res = fold_pattern(bld, re, content_len, bu);
    } catch (const BranchBudgetExceeded&) {
        int64_t* out = (int64_t*)std::calloc(7, sizeof(int64_t));
        out[0] = -1;
        return out;
    }
    BitVal root = bld.force(res.val);

    size_t n = bld.ops.size();
    int64_t* out = (int64_t*)std::malloc((7 + n * 11) * sizeof(int64_t));
    out[0] = (int64_t)n;
    out[1] = bld.ct_ops;
    out[2] = bld.cache_hits;
    out[3] = root.konst;
    out[4] = root.sign;
    out[5] = root.slot;
    out[6] = bld.num_content_slots;
    write_ops(out + 7, bld);
    return out;
}

// Compile MANY patterns into ONE shared hash-consed circuit (the C++ twin of
// engine.py::compile_match_multi).  `asts` is the concatenation of each
// pattern's int32 pre-order encoding; `ast_lens[i]` its length.  The branch
// budget is charged per pattern (fresh budget each), matching the Python
// engine.  Blob layout: int64 header [n_ops, ct_ops, cache_hits, n_roots,
// num_content_slots] then n_roots x (const, sign, slot) int64 triples, then
// the op records (11 int64 each, as circuit_compile).  Budget exceed ->
// header[0] = -1.
int64_t* circuit_compile_multi(const int32_t* asts, const int32_t* ast_lens,
                               int32_t n_patterns, int32_t content_len,
                               int32_t num_blocks,
                               int32_t mode /*0 strict, 1 opt*/,
                               int64_t branch_budget) {
    Builder bld(content_len, num_blocks, mode);
    std::vector<BitVal> roots;
    const int32_t* p = asts;
    for (int32_t i = 0; i < n_patterns; i++) {
        Arena arena;
        const int32_t* q = p;
        const Ast* re = parse_ast(q, arena);
        p += ast_lens[i];
        Budget bu{branch_budget < 0 ? -1 : branch_budget};
        try {
            NodeV res = fold_pattern(bld, re, content_len, bu);
            roots.push_back(bld.force(res.val));
        } catch (const BranchBudgetExceeded&) {
            return budget_exceeded_blob();
        }
    }
    return write_multiroot_blob(bld, roots);
}

// Per-start-position match bits: one root per content position, each the
// OR-fold of only that position's variants (the addends of has_match's
// global OR, engine.rs:15-35).  One shared builder; budget charged once
// across all positions, as circuit_compile.  Blob layout identical to
// circuit_compile_multi with n_roots = content_len.
int64_t* circuit_compile_positions(const int32_t* ast, int32_t ast_len,
                                   int32_t content_len, int32_t num_blocks,
                                   int32_t mode /*0 strict, 1 opt*/,
                                   int64_t branch_budget) {
    const int32_t* p = ast;
    Arena arena;
    const Ast* re = parse_ast(p, arena);
    (void)ast_len;

    Budget bu{branch_budget < 0 ? -1 : branch_budget};
    Builder bld(content_len, num_blocks, mode);
    std::vector<BitVal> roots;
    try {
        for (int i = 0; i < content_len; i++) {
            std::vector<Branch> branches;
            build_branches(content_len, re, i, branches, bu);
            roots.push_back(bld.force(fold_branches(bld, branches).val));
        }
    } catch (const BranchBudgetExceeded&) {
        return budget_exceeded_blob();
    }
    return write_multiroot_blob(bld, roots);
}

void circuit_free(int64_t* p) { std::free(p); }

}  // extern "C"
