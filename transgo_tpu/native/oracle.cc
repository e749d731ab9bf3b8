// oracle.cc — standalone Go rules oracle for differential testing.
//
// A from-scratch implementation of the same rules the reference engine
// (/root/reference/GoEnv/cpp_src/board.cc, go_env.cc) implements, written
// with deliberately different internals: no incremental block linked lists —
// every query recomputes groups with a BFS flood fill, and legality is
// decided by simulating the move ("would the placed group have a liberty
// after captures"), which is provably equivalent to the reference's
// isSuicideMove neighbor-count test (board.cc:130-158). The JAX engine is
// validated against this oracle move-by-move in tests/test_vs_oracle.py.
//
// Behavior spec being matched (reference file:line):
//   - simple ko give/violation/aging .... board.cc:163-213, 546-570
//   - pass/resign/max-step termination .. board.cc:656-661, go_env.cc:51-80
//   - true/fake eyes .................... board.cc:665-714
//   - two-eye life (GivenBlockLives) .... board.cc:731-817
//   - Tromp-Taylor scoring .............. board.cc:822-958
//   - encode9/10/13 feature planes ...... board_feature.cc:199-253
//
// Build: g++ -O2 -std=c++17 -shared -fPIC oracle.cc -o liboracle.so

#include <cstdint>
#include <cstring>

namespace {

constexpr int MAX_SIZE = 19;
constexpr int MAX_N = MAX_SIZE * MAX_SIZE;

constexpr int8_t EMPTY = 0, BLACK = 1, WHITE = 2;
constexpr int PASS = -1, RESIGN = -2, INVALID = -3;

int g_size = 9;
int g_n = 81;
int g_max_step = 120;
float g_komi = 7.5f;

inline int opp(int p) { return BLACK + WHITE - p; }

struct State {
  int8_t stones[MAX_N];
  int32_t next_player;
  int32_t step_count;
  int32_t last_move1;
  int32_t last_move2;
  int32_t ko_location;
  int32_t ko_color;
  int32_t ko_age;
  int32_t terminated;
};

struct Nbrs {
  int c[4];
  int cnt;
};

Nbrs neighbors(int c) {
  Nbrs r;
  r.cnt = 0;
  int x = c % g_size, y = c / g_size;
  const int dx[4] = {-1, 0, 1, 0}, dy[4] = {0, -1, 0, 1};
  for (int i = 0; i < 4; ++i) {
    int nx = x + dx[i], ny = y + dy[i];
    if (nx >= 0 && nx < g_size && ny >= 0 && ny < g_size)
      r.c[r.cnt++] = ny * g_size + nx;
  }
  return r;
}

// diagonals with off-board reported separately
struct Diags {
  int c[4];
  int cnt;
  int off;
};

Diags diagonals(int c) {
  Diags r;
  r.cnt = 0;
  r.off = 0;
  int x = c % g_size, y = c / g_size;
  const int dx[4] = {-1, -1, 1, 1}, dy[4] = {-1, 1, 1, -1};
  for (int i = 0; i < 4; ++i) {
    int nx = x + dx[i], ny = y + dy[i];
    if (nx >= 0 && nx < g_size && ny >= 0 && ny < g_size)
      r.c[r.cnt++] = ny * g_size + nx;
    else
      r.off++;
  }
  return r;
}

// Flood-fill the group containing `c`; returns stone count, fills
// member[] flags and counts distinct liberties.
int flood_group(const int8_t* stones, int c, bool* member, int* liberties) {
  static int queue[MAX_N];
  bool seen_lib[MAX_N] = {false};
  std::memset(member, 0, sizeof(bool) * g_n);
  int color = stones[c];
  int qh = 0, qt = 0, libs = 0, count = 0;
  queue[qt++] = c;
  member[c] = true;
  while (qh < qt) {
    int cur = queue[qh++];
    count++;
    Nbrs nb = neighbors(cur);
    for (int i = 0; i < nb.cnt; ++i) {
      int nc = nb.c[i];
      if (stones[nc] == color && !member[nc]) {
        member[nc] = true;
        queue[qt++] = nc;
      } else if (stones[nc] == EMPTY && !seen_lib[nc]) {
        seen_lib[nc] = true;
        libs++;
      }
    }
  }
  *liberties = libs;
  return count;
}

// Simulate playing `c` for `player` on a scratch board. Returns true if
// legal (not suicide); fills out_board with the post-move position and
// reports whether the move "gives a simple ko" plus the ko point.
bool simulate_play(const int8_t* stones, int c, int player, int8_t* out_board,
                   bool* gives_ko, int* ko_point) {
  std::memcpy(out_board, stones, g_n);
  out_board[c] = (int8_t)player;

  // reference ko-give condition (board.cc:163-194): the point has no empty
  // neighbor, no own neighbor, and exactly one adjacent enemy group that is
  // a single stone in atari.
  int self_lib = 0;
  bool own_adj = false;
  int ko_cnt = 0, ko_loc = INVALID;
  {
    Nbrs nb = neighbors(c);
    for (int i = 0; i < nb.cnt; ++i) {
      int nc = nb.c[i];
      if (stones[nc] == EMPTY) self_lib++;
      else if (stones[nc] == player) own_adj = true;
      else {
        bool member[MAX_N];
        int libs;
        int cnt = flood_group(stones, nc, member, &libs);
        if (libs == 1 && cnt == 1) {
          ko_cnt++;
          ko_loc = nc;
        }
      }
    }
  }
  *gives_ko = (self_lib == 0 && !own_adj && ko_cnt == 1);
  *ko_point = ko_loc;

  // capture: remove adjacent enemy groups with no liberties
  Nbrs nb = neighbors(c);
  for (int i = 0; i < nb.cnt; ++i) {
    int nc = nb.c[i];
    if (out_board[nc] == opp(player)) {
      bool member[MAX_N];
      int libs;
      flood_group(out_board, nc, member, &libs);
      if (libs == 0)
        for (int j = 0; j < g_n; ++j)
          if (member[j]) out_board[j] = EMPTY;
    }
  }
  // suicide check: own group must have a liberty after captures
  bool member[MAX_N];
  int libs;
  flood_group(out_board, c, member, &libs);
  return libs > 0;
}

bool ko_violation(const State* s, int c, int player) {
  return s->ko_location == c && s->ko_age == 0 && s->ko_color == player;
}

bool is_legal(const State* s, int c, int player) {
  if (c < 0 || c >= g_n || s->stones[c] != EMPTY) return false;
  if (ko_violation(s, c, player)) return false;
  int8_t scratch[MAX_N];
  bool gk;
  int kp;
  return simulate_play(s->stones, c, player, scratch, &gk, &kp);
}

// isSuicideMove parity (for the ko+suicide feature plane): note this is the
// *neighbor-count* definition, ignoring ko.
bool is_suicide(const State* s, int c, int player) {
  if (s->stones[c] != EMPTY) return false;
  int8_t scratch[MAX_N];
  bool gk;
  int kp;
  return !simulate_play(s->stones, c, player, scratch, &gk, &kp);
}

bool is_true_eye(const int8_t* stones, int c, int player) {
  if (stones[c] != EMPTY) return false;
  // eye: every on-board neighbor is own
  Nbrs nb = neighbors(c);
  for (int i = 0; i < nb.cnt; ++i)
    if (stones[nb.c[i]] != player) return false;
  // fake: edge/corner with >=1 enemy diagonal or center with >=2
  Diags dg = diagonals(c);
  int num_opp = 0;
  for (int i = 0; i < dg.cnt; ++i)
    if (stones[dg.c[i]] == opp(player)) num_opp++;
  bool fake = (dg.off > 0 && num_opp >= 1) || (dg.off == 0 && num_opp >= 2);
  return !fake;
}

// GivenBlockLives spec (board.cc:731-817)
bool group_lives(const int8_t* stones, const bool* member, int color,
                 int libs) {
  if (libs <= 1) return false;
  int eyes[MAX_N];
  int num_eyes = 0;
  bool is_eye_pt[MAX_N] = {false};
  for (int c = 0; c < g_n; ++c) {
    if (!member[c]) continue;
    Nbrs nb = neighbors(c);
    for (int i = 0; i < nb.cnt; ++i) {
      int e = nb.c[i];
      if (is_eye_pt[e]) continue;
      if (is_true_eye(stones, e, color)) {
        is_eye_pt[e] = true;
        eyes[num_eyes++] = e;
      }
    }
  }
  if (num_eyes <= 1) return false;
  int qualified = 0;
  for (int i = 0; i < num_eyes; ++i) {
    Diags dg = diagonals(eyes[i]);
    int num_boundary = dg.off, num_terr = 0;
    for (int j = 0; j < dg.cnt; ++j) {
      int d = dg.c[j];
      if (stones[d] == color) num_terr++;
      else if (stones[d] == EMPTY && is_eye_pt[d]) num_terr++;
    }
    if ((num_boundary >= 1 && num_boundary + num_terr == 4) ||
        (num_boundary == 0 && num_terr >= 3))
      qualified++;
    if (qualified >= 2) break;
  }
  return qualified >= 2;
}

}  // namespace

extern "C" {

void oracle_init(int size, float komi, int max_step) {
  g_size = size;
  g_n = size * size;
  g_komi = komi;
  g_max_step = max_step;
}

void oracle_reset(State* s) {
  std::memset(s, 0, sizeof(State));
  s->next_player = BLACK;
  s->step_count = 1;
  s->last_move1 = INVALID;
  s->last_move2 = INVALID;
  s->ko_location = INVALID;
  s->ko_age = 0;
  s->terminated = 0;
}

// Returns 1 if the action was applied (legal), 0 otherwise.
int oracle_step(State* s, int action) {
  if (s->terminated) return 0;
  int c = (action == g_n) ? PASS : action;
  bool special = (c == PASS || c == RESIGN);
  int player = s->next_player;

  if (!special) {
    if (!is_legal(s, c, player)) return 0;
    int8_t nb[MAX_N];
    bool gives_ko;
    int ko_point;
    simulate_play(s->stones, c, player, nb, &gives_ko, &ko_point);
    std::memcpy(s->stones, nb, g_n);
    if (gives_ko) {
      s->ko_location = ko_point;
      s->ko_color = opp(player);
      s->ko_age = 0;
    } else {
      s->ko_age++;
    }
  }
  s->last_move2 = s->last_move1;
  s->last_move1 = c;
  s->step_count++;
  s->next_player = opp(player);

  bool done = (s->last_move1 == PASS && s->last_move2 == PASS) ||
              s->last_move1 == RESIGN;
  if (done || s->step_count > g_max_step) s->terminated = 1;
  return 1;
}

// uint8 out[n]: legal board moves for the next player.
void oracle_legal_mask(const State* s, uint8_t* out) {
  for (int c = 0; c < g_n; ++c)
    out[c] = is_legal(s, c, s->next_player) ? 1 : 0;
}

// territory out[n] in {BLACK, WHITE, 3=dame}; returns raw TT score (no komi)
float oracle_territory(const State* s, int8_t* out) {
  // label empty regions by BFS; stones own themselves
  bool visited[MAX_N] = {false};
  int black = 0, white = 0;
  static int queue[MAX_N];
  static int region[MAX_N];
  for (int c = 0; c < g_n; ++c) {
    if (s->stones[c] != EMPTY) {
      out[c] = s->stones[c];
      if (s->stones[c] == BLACK) black++;
      else white++;
      continue;
    }
    if (visited[c]) continue;
    int qh = 0, qt = 0, rn = 0;
    bool tb = false, tw = false;
    queue[qt++] = c;
    visited[c] = true;
    while (qh < qt) {
      int cur = queue[qh++];
      region[rn++] = cur;
      Nbrs nb = neighbors(cur);
      for (int i = 0; i < nb.cnt; ++i) {
        int nc = nb.c[i];
        if (s->stones[nc] == BLACK) tb = true;
        else if (s->stones[nc] == WHITE) tw = true;
        else if (!visited[nc]) {
          visited[nc] = true;
          queue[qt++] = nc;
        }
      }
    }
    int8_t owner = (tb && !tw) ? BLACK : (tw && !tb) ? WHITE : 3;
    for (int i = 0; i < rn; ++i) out[region[i]] = owner;
    if (owner == BLACK) black += rn;
    else if (owner == WHITE) white += rn;
  }
  return (float)(black - white);
}

float oracle_score(const State* s) {
  int8_t terr[MAX_N];
  return oracle_territory(s, terr) - g_komi;
}

// float out[planes * n], plane-major (reference [C, H, W] layout)
void oracle_encode(const State* s, float* out, int planes) {
  std::memset(out, 0, sizeof(float) * planes * g_n);
  int player = s->next_player;
  int other = opp(player);

  // liberty planes 0-5
  bool counted[MAX_N] = {false};
  for (int c = 0; c < g_n; ++c) {
    if (s->stones[c] == EMPTY || counted[c]) continue;
    bool member[MAX_N];
    int libs;
    flood_group(s->stones, c, member, &libs);
    int color = s->stones[c];
    int base = (color == player) ? 0 : 3;
    int lane = (libs >= 3) ? 2 : libs - 1;
    for (int j = 0; j < g_n; ++j)
      if (member[j]) {
        counted[j] = true;
        if (lane >= 0) out[(base + lane) * g_n + j] = 1.0f;
      }
  }
  // plane 6: last move
  if (s->last_move1 >= 0) out[6 * g_n + s->last_move1] = 1.0f;
  // plane 7: suicide for next player + active ko point
  for (int c = 0; c < g_n; ++c)
    if (s->stones[c] == EMPTY && is_suicide(s, c, player))
      out[7 * g_n + c] = 1.0f;
  if (s->ko_age == 0 && s->ko_location >= 0) out[7 * g_n + s->ko_location] = 1.0f;
  if (planes == 9) {
    // encode9: plane 8 own true eyes only
    for (int c = 0; c < g_n; ++c)
      if (is_true_eye(s->stones, c, player)) out[8 * g_n + c] = 1.0f;
    return;
  }
  if (planes == 10) {
    for (int c = 0; c < g_n; ++c)
      if (is_true_eye(s->stones, c, player)) out[8 * g_n + c] = 1.0f;
    // plane 9: own live groups
    std::memset(counted, 0, sizeof(counted));
    for (int c = 0; c < g_n; ++c) {
      if (s->stones[c] != player || counted[c]) continue;
      bool member[MAX_N];
      int libs;
      flood_group(s->stones, c, member, &libs);
      bool alive = group_lives(s->stones, member, player, libs);
      for (int j = 0; j < g_n; ++j)
        if (member[j]) {
          counted[j] = true;
          if (alive) out[9 * g_n + j] = 1.0f;
        }
    }
    return;
  }
  // planes == 13 (board_feature.cc:238-253)
  if (s->last_move2 >= 0) out[7 * g_n + s->last_move2] = 1.0f;  // overwrite: re-layout below
  // redo layout for 13: planes 6 hist1, 7 hist2, 8 ko+suicide, 9 own eyes,
  // 10 opp eyes, 11 own live, 12 opp live
  std::memset(out + 6 * g_n, 0, sizeof(float) * (planes - 6) * g_n);
  if (s->last_move1 >= 0) out[6 * g_n + s->last_move1] = 1.0f;
  if (s->last_move2 >= 0) out[7 * g_n + s->last_move2] = 1.0f;
  for (int c = 0; c < g_n; ++c)
    if (s->stones[c] == EMPTY && is_suicide(s, c, player))
      out[8 * g_n + c] = 1.0f;
  if (s->ko_age == 0 && s->ko_location >= 0) out[8 * g_n + s->ko_location] = 1.0f;
  for (int c = 0; c < g_n; ++c) {
    if (is_true_eye(s->stones, c, player)) out[9 * g_n + c] = 1.0f;
    if (is_true_eye(s->stones, c, other)) out[10 * g_n + c] = 1.0f;
  }
  std::memset(counted, 0, sizeof(counted));
  for (int c = 0; c < g_n; ++c) {
    if (s->stones[c] == EMPTY || counted[c]) continue;
    bool member[MAX_N];
    int libs;
    flood_group(s->stones, c, member, &libs);
    bool alive = group_lives(s->stones, member, s->stones[c], libs);
    int plane = (s->stones[c] == player) ? 11 : 12;
    for (int j = 0; j < g_n; ++j)
      if (member[j]) {
        counted[j] = true;
        if (alive) out[plane * g_n + j] = 1.0f;
      }
  }
}

int oracle_state_size() { return (int)sizeof(State); }

}  // extern "C"
