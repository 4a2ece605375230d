// Golden-trace generator for the kinematic character controller.
//
// Replicates the reference's modified Bullet btKinematicCharacterController
// (env/src/kinematic_character_controller.cpp) for CAPSULE-vs-AABB worlds in
// float32, phase for phase:
//   playerStep   kcc.cpp:528-602  (gravity, velocity clamps, phase order,
//                                  momentum arrest, recovery, friction)
//   stepUp       kcc.cpp:223-304  (ceiling-filtered sweep, step offset)
//   stepForward  kcc.cpp:337-393  (<=10-iteration sweep-slide,
//                                  updateTargetPositionBasedOnCollision
//                                  kcc.cpp:313-329, Quake2 stop rule)
//   stepDown     kcc.cpp:400-442  (floor-filtered sweep, landing)
//   recover      kcc.cpp:156-221  (penetration > 0.041 push-out, <=4 loops)
//   setAcceleration kcc.cpp:753-792, jump agent.cpp:157-161 (6.2 m/s),
//   callback slope filters kcc.cpp:52-93, env step order env.cpp:89-122.
//
// The one intentional substitution: Bullet's GJK conservative-advancement
// convex sweep is replaced by an ANALYTIC capsule-vs-AABB time of impact
// (the vertical-capsule/axis-aligned-box distance has a closed form;
// entry time found by convex bisection to float precision). Bullet's CA
// terminates within ~1e-3 of the exact contact; the analytic answer is the
// limit it approximates, so the trace is the cleaner spec of the same
// algorithm. Everything else (phase logic, filters, constants, float32
// arithmetic) follows the reference line by line.
//
// Output: one CSV per scene to stdout, consumed by tests/test_kcc_golden.py.
// Rebuild:
//   g++ -O2 -o /tmp/kcc_golden tests/golden/kcc_golden.cpp
//   /tmp/kcc_golden > tests/golden/kcc_golden.txt
#include <cmath>
#include <cstdio>
#include <vector>

typedef float S;  // btScalar (float32 build, as the reference uses)

static const S SIMD_EPSILON = 1.1920929e-07f;

struct V3 {
    S x, y, z;
    V3(S a = 0, S b = 0, S c = 0) : x(a), y(b), z(c) {}
    V3 operator+(const V3 &o) const { return V3(x + o.x, y + o.y, z + o.z); }
    V3 operator-(const V3 &o) const { return V3(x - o.x, y - o.y, z - o.z); }
    V3 operator*(S s) const { return V3(x * s, y * s, z * s); }
    V3 operator/(S s) const { return V3(x / s, y / s, z / s); }
    S dot(const V3 &o) const { return x * o.x + y * o.y + z * o.z; }
    S length2() const { return dot(*this); }
    S length() const { return std::sqrt(length2()); }
    bool fuzzyZero() const { return length2() < SIMD_EPSILON * SIMD_EPSILON; }
    V3 normalized() const { S l = length(); return V3(x / l, y / l, z / l); }
};

struct Box { V3 lo, hi; };

// ---- capsule geometry (agent.cpp:52-54) ----
static const S RADIUS = 0.33f;
static const S CYL_HALF = 1.05f / 2;  // btCapsuleShape(radius, height): height
                                      // is the CYLINDER section

// Distance from the capsule at center c to box b, minus the radius
// (signed: negative = penetrating), plus the closest axis point / box point
// pair that realizes it. Exact for a vertical capsule vs an AABB: the
// horizontal clamp is independent of the segment parameter.
struct DistResult { S dist; V3 axisPt, boxPt; };
static DistResult capsuleBoxDist(const V3 &c, const Box &b) {
    // closest point of the segment's y-interval to the box's y-interval;
    // when the intervals overlap any shared y gives dy = 0 — clamp the
    // center for a stable witness (it decides the touching-contact normal)
    S segLo = c.y - CYL_HALF, segHi = c.y + CYL_HALF;
    S ay;
    if (segLo > b.hi.y) ay = segLo;
    else if (segHi < b.lo.y) ay = segHi;
    else ay = c.y < b.lo.y ? b.lo.y : (c.y > b.hi.y ? b.hi.y : c.y);
    V3 a(c.x, ay, c.z);
    V3 q(a.x < b.lo.x ? b.lo.x : (a.x > b.hi.x ? b.hi.x : a.x),
         a.y < b.lo.y ? b.lo.y : (a.y > b.hi.y ? b.hi.y : a.y),
         a.z < b.lo.z ? b.lo.z : (a.z > b.hi.z ? b.hi.z : a.z));
    S d = (a - q).length();
    DistResult r; r.dist = d - RADIUS; r.axisPt = a; r.boxPt = q;
    return r;
}

// Deep-penetration direction: if the axis point is INSIDE the box the
// witness pair coincides; push along the least-penetrated face like EPA
// would for this pair.
static V3 penetrationNormal(const V3 &c, const Box &b, const DistResult &r) {
    V3 d = r.axisPt - r.boxPt;
    S l = d.length();
    if (l > 1e-9f) return d / l;
    V3 ctr = (b.lo + b.hi) * 0.5f;
    V3 he = (b.hi - b.lo) * 0.5f;
    S px = he.x - std::fabs(r.axisPt.x - ctr.x);
    S py = he.y - std::fabs(r.axisPt.y - ctr.y);
    S pz = he.z - std::fabs(r.axisPt.z - ctr.z);
    if (px <= py && px <= pz) return V3(r.axisPt.x > ctr.x ? 1.f : -1.f, 0, 0);
    if (py <= pz) return V3(0, r.axisPt.y > ctr.y ? 1.f : -1.f, 0);
    return V3(0, 0, r.axisPt.z > ctr.z ? 1.f : -1.f);
}

struct Hit { bool hit = false; S frac = 1.0f; V3 normal; };

// Analytic capsule sweep from `from` to `to` against one box: the signed
// distance along the segment-lerp is convex in t, so the entry root is
// isolated by ternary-search for the minimum + bisection (float-exact).
static bool sweepOne(const V3 &from, const V3 &to, const Box &b,
                     S &frac, V3 &normal) {
    DistResult d0 = capsuleBoxDist(from, b);
    if (d0.dist <= 0) {  // already touching: blocked at the start
        frac = 0.0f;
        normal = penetrationNormal(from, b, d0);
        return true;
    }
    V3 d = to - from;
    DistResult d1 = capsuleBoxDist(to, b);
    // find the minimizing t by ternary search (distance is convex in t)
    S lo = 0, hi = 1;
    for (int i = 0; i < 60; ++i) {
        S m1 = lo + (hi - lo) / 3, m2 = hi - (hi - lo) / 3;
        if (capsuleBoxDist(from + d * m1, b).dist
            <= capsuleBoxDist(from + d * m2, b).dist) hi = m2; else lo = m1;
    }
    S tmin = (lo + hi) * 0.5f;
    if (capsuleBoxDist(from + d * tmin, b).dist > 0) return false;  // never touches
    // entry root in [0, tmin]
    S a = 0, z = tmin;
    for (int i = 0; i < 60; ++i) {
        S m = (a + z) * 0.5f;
        if (capsuleBoxDist(from + d * m, b).dist > 0) a = m; else z = m;
    }
    frac = a;  // last separated parameter (Bullet reports the pre-contact TOI)
    DistResult dh = capsuleBoxDist(from + d * frac, b);
    normal = penetrationNormal(from + d * frac, b, dh);
    (void)d1;
    return true;
}

// convexSweepTest + KinematicClosestNotMeConvexResultCallback
// (kcc.cpp:52-93): hits whose world normal satisfies up.dot(n) < minSlopeDot
// are ignored.
static Hit sweep(const std::vector<Box> &world, const V3 &from, const V3 &to,
                 const V3 &up, S minSlopeDot) {
    Hit best;
    for (const Box &b : world) {
        S frac; V3 n;
        if (!sweepOne(from, to, b, frac, n)) continue;
        if (up.dot(n) < minSlopeDot) continue;   // callback filter
        if (frac < best.frac || !best.hit) {
            best.hit = true; best.frac = frac; best.normal = n;
        }
    }
    return best;
}

// ---- the controller (kcc.cpp) ----
struct KCC {
    V3 pos;                    // ghost origin == capsule center
    V3 hvel;                   // horizontalVelocity
    S vvel = 0, voffset = 0;   // m_verticalVelocity / m_verticalOffset
    S stepOffsetCur = 0;       // m_currentStepOffset
    bool wasOnGround = false, wasJumping = false;
    V3 targetPos;

    static constexpr S gravity = 1.4f * 9.8f;        // kcc.hpp:169
    static constexpr S fallSpeed = 55.0f;            // kcc.cpp:135
    static constexpr S jumpSpeed = 10.0f;            // kcc.cpp:136 (jump()
                                                     // overrides with 6.2)
    static constexpr S stepHeight = 0.2f;            // agent.cpp:59
    static constexpr S maxSlopeCos = 0.70710678f;    // cos(45 deg)
    static constexpr S maxPenetrationDepth = 0.041f; // kcc.hpp:155
    static constexpr S maxHorizontalSpeed = 4.5f;    // kcc.hpp:173
    static constexpr S maxAirSpeed = 1.0f;
    static constexpr S normalDeceleration = 15.0f;
    static constexpr S maxAcceleration = 35.0f + normalDeceleration;
    static constexpr S maxAirAcceleration = 3.0f;
    static constexpr S overspeedDeceleration = maxAcceleration * 2;

    bool onGround() const {                          // kcc.cpp:679-682
        return std::fabs(vvel) < SIMD_EPSILON && std::fabs(voffset) < SIMD_EPSILON;
    }

    void setAcceleration(V3 acc, S dt) {             // kcc.cpp:753-792
        bool ground = onGround();
        S mag = acc.length();
        S maxAcc = ground ? maxAcceleration : maxAirAcceleration;
        if (!acc.fuzzyZero()) acc = acc * (maxAcc / mag);
        if (ground) {
            hvel = hvel + acc * dt;
            S sp = hvel.length();
            if (sp > maxHorizontalSpeed) {
                S dv = overspeedDeceleration * dt;
                if (sp - dv > maxHorizontalSpeed) hvel = hvel * ((sp - dv) / sp);
                else hvel = hvel * (maxHorizontalSpeed / sp);
            }
        } else {
            S sp = hvel.length();
            V3 nv = hvel + acc * dt;
            S nsp = nv.length();
            if (nsp <= maxAirSpeed || nsp < sp) hvel = nv;
        }
    }

    void jump() {                                    // agent.cpp:157-161 +
        if (!onGround()) return;                     // kcc.cpp:703-716
        vvel = 6.2f;
        wasJumping = true;
    }

    bool recoverFromPenetration(const std::vector<Box> &world) {
        // kcc.cpp:156-221: first pair penetrating deeper than
        // maxPenetrationDepth pushes the ghost out; one pair per call.
        for (const Box &b : world) {
            DistResult r = capsuleBoxDist(pos, b);
            if (r.dist < -maxPenetrationDepth) {
                V3 n = penetrationNormal(pos, b, r);
                pos = pos + n * (-r.dist);  // posDelta = n * |dist|
                return true;
            }
        }
        return false;
    }

    void stepUp(const std::vector<Box> &world) {     // kcc.cpp:223-304
        S sh = vvel < 0 ? stepHeight : 0.0f;
        targetPos = pos + V3(0, 1, 0) * sh
                  + V3(0, 1, 0) * (voffset > 0 ? voffset : 0.f);
        V3 start = pos;
        pos = targetPos;
        Hit cb = sweep(world, start, targetPos, V3(0, -1, 0), maxSlopeCos);
        if (cb.hit) {
            if (cb.normal.dot(V3(0, 1, 0)) > 0) {    // slope (can't happen
                stepOffsetCur = sh * cb.frac;        // through the filter,
                pos = start + (targetPos - start) * cb.frac;  // kept for parity)
            }
            // ceiling: position stays at target; recovery pushes out
            int loops = 0;
            while (recoverFromPenetration(world)) {
                if (++loops > 4) break;
            }
            targetPos = pos;
            if (voffset > 0) {
                voffset = 0;
                vvel = 0;
                stepOffsetCur = stepHeight;
            }
        } else {
            stepOffsetCur = sh;
            pos = targetPos;
        }
    }

    void updateTargetPosition(const V3 &hitNormal, S fraction) {
        // kcc.cpp:313-329
        V3 move = targetPos - pos;
        S len = move.length();
        if (len > SIMD_EPSILON) {
            V3 dir = move / len;
            V3 par = hitNormal * dir.dot(hitNormal);
            V3 perp = dir - par;
            targetPos = pos + perp * len + par * (len * fraction);
        }
    }

    void stepForwardAndStrafe(const std::vector<Box> &world, S dt) {
        // kcc.cpp:337-393
        targetPos = pos + hvel * dt;
        int maxIter = 10;
        while (maxIter-- > 0) {
            V3 sweepDirNeg = pos - targetPos;
            Hit cb;
            bool same = (pos - targetPos).length2() == 0;
            if (!same)
                cb = sweep(world, pos, targetPos, sweepDirNeg, 0.0f);
            if (cb.hit) {
                updateTargetPosition(cb.normal, cb.frac);
                V3 cur = targetPos - pos;
                S d2 = cur.length2();
                if (d2 > 0.0001f) {
                    V3 cdir = cur.normalized();
                    if (cdir.dot(hvel) <= 0.0f) { targetPos = pos; break; }
                } else { targetPos = pos; break; }
            } else break;
        }
        pos = targetPos;
    }

    void stepDown(const std::vector<Box> &world, S dt) {  // kcc.cpp:400-442
        S downVel = vvel < 0 ? -vvel : 0.f;
        if (downVel > 0 && downVel > fallSpeed && (wasOnGround || !wasJumping))
            downVel = fallSpeed;
        V3 drop = V3(0, 1, 0) * (stepOffsetCur + downVel * dt);
        targetPos = targetPos - drop;
        Hit cb = sweep(world, pos, targetPos, V3(0, 1, 0), maxSlopeCos);
        if (cb.hit) {
            pos = pos + (targetPos - pos) * cb.frac;
            vvel = 0;
            voffset = 0;
            wasJumping = false;
        } else {
            pos = targetPos;
        }
    }

    void playerStep(const std::vector<Box> &world, S dt) {  // kcc.cpp:528-602
        V3 original = pos;
        wasOnGround = onGround();
        vvel -= gravity * dt;
        if (vvel > 0 && vvel > jumpSpeed) vvel = jumpSpeed;
        if (vvel < 0 && std::fabs(vvel) > fallSpeed) vvel = -fallSpeed;
        voffset = vvel * dt;
        stepUp(world);
        stepForwardAndStrafe(world, dt);
        stepDown(world, dt);
        hvel = (pos - original) / dt;                 // momentum arrest
        hvel.y = 0;
        int loops = 0;
        while (recoverFromPenetration(world)) {
            if (++loops > 4) break;
        }
        if (onGround()) {                              // friction
            S sp = hvel.length();
            if (sp - normalDeceleration * dt < 0) hvel = V3();
            else hvel = hvel * ((sp - normalDeceleration * dt) / sp);
        }
    }
};

// ---- env-level action decode (env.cpp:89-122) ----
enum Action {
    Left = 1 << 1, Right = 1 << 2, Forward = 1 << 3, Backward = 1 << 4,
    Jump = 1 << 7,
};

static void runScene(const char *name, const std::vector<Box> &world,
                     V3 startPos, S yaw, const std::vector<int> &actions) {
    const S dt = 1.0f / 15.0f;
    KCC k;
    k.pos = startPos;
    printf("SCENE %s yaw=%.9g start=%.9g,%.9g,%.9g boxes=%zu\n",
           name, yaw, startPos.x, startPos.y, startPos.z, world.size());
    // forward = -sin(yaw), 0, -cos(yaw); strafe-left = -cos(yaw),0,sin(yaw)
    // (agent.cpp:135-150 with the ghost's basis at fixed yaw)
    V3 fwd(-std::sin(yaw), 0, -std::cos(yaw));
    V3 left(-std::cos(yaw), 0, std::sin(yaw));
    for (size_t t = 0; t < actions.size(); ++t) {
        int a = actions[t];
        V3 acc;
        if (a & Forward) acc = acc + fwd;
        else if (a & Backward) acc = acc - fwd;
        if (a & Left) acc = acc + left;
        else if (a & Right) acc = acc - left;
        k.setAcceleration(acc, dt);
        if (a & Jump) k.jump();
        k.playerStep(world, dt);
        printf("%zu,%.9g,%.9g,%.9g,%.9g,%.9g,%.9g,%.9g,%d\n",
               t, k.pos.x, k.pos.y, k.pos.z,
               k.hvel.x, k.hvel.z, k.vvel, k.voffset, k.onGround() ? 1 : 0);
    }
    printf("END\n");
}

int main() {
    // Worlds are unit-voxel-aligned AABBs so the voxel-grid physics
    // represents them exactly. Capsule center spawns at bottom+0.855.
    const S H = CYL_HALF + RADIUS;  // 0.855 capsule half height

    // 1. flat floor: accelerate forward 40 ticks, coast 20 (friction stop).
    {
        std::vector<Box> w = {{V3(-20, -1, -20), V3(20, 0, 20)}};
        std::vector<int> a;
        for (int i = 0; i < 40; ++i) a.push_back(Forward);
        for (int i = 0; i < 20; ++i) a.push_back(0);
        runScene("flat_walk", w, V3(0.5f, H, 0.5f), 0.0f, a);
    }
    // 2. wall glance: wall at z=-4..-3, approach at ~30 degrees.
    {
        std::vector<Box> w = {{V3(-20, -1, -20), V3(20, 0, 20)},
                              {V3(-20, 0, -4), V3(20, 3, -3)}};
        std::vector<int> a;
        for (int i = 0; i < 50; ++i) a.push_back(Forward);
        runScene("wall_glance", w, V3(0.5f, H, 0.5f), 0.5f, a);
    }
    // 3. corner: two walls meeting at x=3, z=-3; walk diagonally into it.
    {
        std::vector<Box> w = {{V3(-20, -1, -20), V3(20, 0, 20)},
                              {V3(-20, 0, -4), V3(20, 3, -3)},
                              {V3(3, 0, -20), V3(4, 3, 20)}};
        std::vector<int> a;
        for (int i = 0; i < 50; ++i) a.push_back(Forward);
        runScene("corner_stop", w, V3(0.5f, H, 0.5f), -0.78539816f, a);
    }
    // 4. blocked by a 1m step (step height 0.2 cannot climb a voxel).
    {
        std::vector<Box> w = {{V3(-20, -1, -20), V3(20, 0, 20)},
                              {V3(-20, 0, -6), V3(20, 1, -4)}};
        std::vector<int> a;
        for (int i = 0; i < 45; ++i) a.push_back(Forward);
        runScene("voxel_step_blocked", w, V3(0.5f, H, 0.5f), 0.0f, a);
    }
    // 5. jump while running, land (parabola + landing snap).
    {
        std::vector<Box> w = {{V3(-20, -1, -20), V3(20, 0, 20)}};
        std::vector<int> a;
        for (int i = 0; i < 10; ++i) a.push_back(Forward);
        a.push_back(Forward | Jump);
        for (int i = 0; i < 30; ++i) a.push_back(Forward);
        runScene("jump_land", w, V3(0.5f, H, 0.5f), 0.0f, a);
    }
    // 6. ceiling bump: slab 2m above the floor; jump into it.
    {
        std::vector<Box> w = {{V3(-20, -1, -20), V3(20, 0, 20)},
                              {V3(-20, 2, -20), V3(20, 3, 20)}};
        std::vector<int> a;
        for (int i = 0; i < 3; ++i) a.push_back(0);
        a.push_back(Jump);
        for (int i = 0; i < 26; ++i) a.push_back(0);
        runScene("ceiling_bump", w, V3(0.5f, H, 0.5f), 0.0f, a);
    }
    // 7. walk off a ledge: floor ends at z=-5; fall to a lower floor.
    {
        std::vector<Box> w = {{V3(-20, -1, -5), V3(20, 0, 20)},
                              {V3(-20, -4, -20), V3(20, -3, -5)}};
        std::vector<int> a;
        for (int i = 0; i < 55; ++i) a.push_back(Forward);
        runScene("ledge_fall", w, V3(0.5f, H, 0.5f), 0.0f, a);
    }
    // 8. worst-angle corner contacts vs a 1-voxel pillar, approached along
    //    the corner diagonal (the angle where a bounding-square footprint
    //    would stop r*(sqrt(2)-1) = 0.137 m early). Head-on: dead stop at
    //    the capsule circle's exact corner distance. Graze (path offset
    //    0.25 m perpendicular, < r): the circle contacts the corner ARC and
    //    deflects around it, continuing past the pillar.
    {
        std::vector<Box> w = {{V3(-20, -1, -20), V3(20, 0, 20)},
                              {V3(3, 0, -3), V3(4, 3, -2)}};
        std::vector<int> a;
        for (int i = 0; i < 50; ++i) a.push_back(Forward);
        runScene("corner_head_on", w,
                 V3(0.87867966f, H, 0.12132034f), -0.78539816f, a);
        runScene("corner_graze", w,
                 V3(1.05545636f, H, 0.29809704f), -0.78539816f, a);
    }
    // 9. high-ledge brush: an overhead slab whose bottom (y=1.62) sits in
    //    the capsule's rounded-TOP band (cylinder top at 1.38 < 1.62 <
    //    apex 1.71). The true convex shape contacts the slab's lower edge
    //    at the reduced horizontal reach sqrt(r^2 - 0.24^2) = 0.2265 m,
    //    where a full-[bottom,top]-extent footprint stops at the full
    //    radius 0.33 — this scene BOUNDS the engine's last footprint
    //    approximation (ops/physics.py end-sphere note): expected steady
    //    divergence r - sqrt(r^2 - dy^2) = 0.104 m.
    {
        std::vector<Box> w = {{V3(-20, -1, -20), V3(20, 0, 20)},
                              {V3(-20, 1.62f, -4), V3(20, 3, -3)}};
        std::vector<int> a;
        for (int i = 0; i < 45; ++i) a.push_back(Forward);
        runScene("high_ledge_brush", w, V3(0.5f, H, 0.5f), 0.0f, a);
    }
    return 0;
}
