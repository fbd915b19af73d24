/* Dumps the VP8 spec constant tables (RFC 6386 data: probability defaults,
 * coding trees, quantizer lookups, token metadata) to JSON, for mechanical
 * generation of alfalfa_tpu/bitstream/vp8_tables.json.  These are spec
 * constants shared by every VP8 implementation. */
#include <cstdio>
#include <cstring>

#include "quantization.cc" /* pulls in tokens.hh, modemv_data.hh, and the static qlookup tables */
#include "vp8_prob_data.hh"

#include <vector>
#include <string>

static bool first_field = true;

static void key( const char * name )
{
  if ( not first_field ) printf( ",\n" );
  first_field = false;
  printf( "\"%s\": ", name );
}

template <typename T, unsigned int n>
void dump1( const SafeArray<T, n> & a )
{
  printf( "[" );
  for ( size_t i = 0; i < n; i++ ) printf( "%s%d", i ? "," : "", int( a.at( i ) ) );
  printf( "]" );
}

template <typename T, unsigned int n, unsigned int m>
void dump2( const SafeArray<SafeArray<T, n>, m> & a )
{
  printf( "[" );
  for ( size_t i = 0; i < m; i++ ) { if ( i ) printf( "," ); dump1( a.at( i ) ); }
  printf( "]" );
}

template <typename T, unsigned int n, unsigned int m, unsigned int o>
void dump3( const SafeArray<SafeArray<SafeArray<T, n>, m>, o> & a )
{
  printf( "[" );
  for ( size_t i = 0; i < o; i++ ) { if ( i ) printf( "," ); dump2( a.at( i ) ); }
  printf( "]" );
}

template <typename T, unsigned int n, unsigned int m, unsigned int o, unsigned int p>
void dump4( const SafeArray<SafeArray<SafeArray<SafeArray<T, n>, m>, o>, p> & a )
{
  printf( "[" );
  for ( size_t i = 0; i < p; i++ ) { if ( i ) printf( "," ); dump3( a.at( i ) ); }
  printf( "]" );
}

int main()
{
  printf( "{\n" );

  key( "dc_qlookup" ); dump1( dc_qlookup );
  key( "ac_qlookup" ); dump1( ac_qlookup );
  key( "zigzag" ); dump1( zigzag );
  key( "coefficient_to_band" ); dump1( coefficient_to_band );

  key( "default_coeff_probs" ); dump4( k_default_coeff_probs );
  key( "coeff_update_probs" ); dump4( k_coeff_entropy_update_probs );
  key( "default_mv_probs" ); dump2( k_default_mv_probs );
  key( "mv_update_probs" ); dump2( k_mv_entropy_update_probs );
  key( "default_y_mode_probs" ); dump1( k_default_y_mode_probs );
  key( "default_uv_mode_probs" ); dump1( k_default_uv_mode_probs );

  key( "kf_y_mode_probs" ); dump1( kf_y_mode_probs );
  key( "kf_uv_mode_probs" ); dump1( kf_uv_mode_probs );
  key( "kf_b_mode_probs" ); dump3( kf_b_mode_probs );
  key( "invariant_b_mode_probs" ); dump1( invariant_b_mode_probs );

  key( "kf_y_mode_tree" ); dump1( kf_y_mode_tree );
  key( "y_mode_tree" ); dump1( y_mode_tree );
  key( "uv_mode_tree" ); dump1( uv_mode_tree );
  key( "b_mode_tree" ); dump1( b_mode_tree );
  key( "small_mv_tree" ); dump1( small_mv_tree );
  key( "mv_ref_tree" ); dump1( mv_ref_tree );
  key( "submv_ref_tree" ); dump1( submv_ref_tree );
  key( "split_mv_tree" ); dump1( split_mv_tree );
  key( "segment_id_tree" ); dump1( segment_id_tree );

  key( "mv_counts_to_probs" ); dump2( mv_counts_to_probs );
  key( "split_mv_probs" ); dump1( split_mv_probs );
  key( "submv_ref_probs2" ); dump2( submv_ref_probs2 );

  key( "mv_partitions" );
  printf( "[" );
  for ( size_t i = 0; i < 4; i++ ) {
    if ( i ) printf( "," );
    printf( "[" );
    const auto & parts = mv_partitions.at( i );
    for ( size_t j = 0; j < parts.size(); j++ ) {
      if ( j ) printf( "," );
      printf( "[" );
      for ( size_t k = 0; k < parts[ j ].size(); k++ ) {
        printf( "%s[%d,%d]", k ? "," : "", parts[ j ][ k ].first, parts[ j ][ k ].second );
      }
      printf( "]" );
    }
    printf( "]" );
  }
  printf( "]" );

  /* token extra-bit decoders: [base_value, [bit probs...]] */
  key( "token_decoders" );
  printf( "[" );
  {
    auto d1 = [] ( uint16_t base, const uint8_t * probs, int n, bool comma ) {
      printf( "%s[%d,[", comma ? "," : "", base );
      for ( int i = 0; i < n; i++ ) printf( "%s%d", i ? "," : "", probs[ i ] );
      printf( "]]" );
    };
    const uint8_t p1[] = { 165, 145 };
    const uint8_t p2[] = { 173, 148, 140 };
    const uint8_t p3[] = { 176, 155, 140, 135 };
    const uint8_t p4[] = { 180, 157, 141, 134, 130 };
    const uint8_t p5[] = { 254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129 };
    d1( 7, p1, 2, false ); d1( 11, p2, 3, true ); d1( 19, p3, 4, true );
    d1( 35, p4, 5, true ); d1( 67, p5, 11, true );
  }
  printf( "]" );

  printf( "\n}\n" );
  return 0;
}
